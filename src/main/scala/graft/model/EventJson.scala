package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's wire format: one job = one JSON object string
  * (lib/flume/event.ex). Encode/decode as Column expressions so
  * (de)serialization runs inside codegen on executors.
  *
  * Decode is LENIENT, matching event.ex:60-80: unknown fields are
  * dropped, missing fields defaulted (function→"perform",
  * retry_count→0), and a map-valued `args` is coerced to "[]"
  * (event.ex:88-89,107-109). `args` itself stays a RAW JSON substring —
  * the engine never interprets it (heterogeneous arrays pass through
  * untouched). Timestamps are float unix seconds with µs precision
  * (support/time.ex:24-32). Invalid JSON yields a null jid — callers
  * route those to the dead table (poison messages don't kill the
  * pipeline, worker.ex:43-45).
  */
object EventJson {

  private val envelopeSchema = new StructType()
    .add("class", StringType).add("function", StringType)
    .add("queue", StringType).add("jid", StringType)
    .add("retry_count", IntegerType)
    .add("enqueued_at", DoubleType).add("finished_at", DoubleType)
    .add("failed_at", DoubleType).add("retried_at", DoubleType)
    .add("error_message", StringType).add("error_backtrace", StringType)
    .add("context", MapType(StringType, StringType))

  private def secsToTs(c: Column): Column =
    timestamp_micros((c * 1e6).cast("long"))

  private def tsToSecs(c: Column): Column =
    (unix_micros(c).cast("double") / 1e6)

  /** jsonCol (one JSON object string per row) → envelope columns. */
  def decode(df: DataFrame, jsonCol: Column): DataFrame = {
    val env = from_json(jsonCol, envelopeSchema)
    val rawArgs = get_json_object(jsonCol, "$.args")
    df.select(
      env.getField("class").as("clazz"),
      coalesce(env.getField("function"), lit("perform")).as("function"),
      env.getField("queue").as("queue"),
      env.getField("jid").as("jid"),
      // raw JSON array passthrough; map-valued args coerced to []
      when(rawArgs.isNull || substring(ltrim(rawArgs), 1, 1) =!= "[", lit("[]"))
        .otherwise(rawArgs).as("args"),
      coalesce(env.getField("retry_count"), lit(0)).as("retry_count"),
      secsToTs(env.getField("enqueued_at")).as("enqueued_at"),
      secsToTs(env.getField("finished_at")).as("finished_at"),
      secsToTs(env.getField("failed_at")).as("failed_at"),
      secsToTs(env.getField("retried_at")).as("retried_at"),
      env.getField("error_message").as("error_message"),
      env.getField("error_backtrace").as("error_backtrace"),
      coalesce(env.getField("context"),
        map().cast(MapType(StringType, StringType))).as("context"))
  }

  /** Envelope columns → the reference JSON shape, in a `json` column.
    * `args` is spliced in raw (it is already JSON). */
  def encode(df: DataFrame): DataFrame = {
    val withScalars = df.withColumn("__scalars__", to_json(struct(
      col("clazz").as("class"), col("function"), col("queue"), col("jid"),
      col("retry_count"),
      tsToSecs(col("enqueued_at")).as("enqueued_at"),
      tsToSecs(col("finished_at")).as("finished_at"),
      tsToSecs(col("failed_at")).as("failed_at"),
      tsToSecs(col("retried_at")).as("retried_at"),
      col("error_message"), col("error_backtrace"), col("context"))))
    withScalars
      .withColumn("json", concat(
        expr("substring(__scalars__, 1, length(__scalars__) - 1)"),
        lit(",\"args\":"), coalesce(col("args"), lit("[]")), lit("}")))
      .drop("__scalars__")
  }
}
