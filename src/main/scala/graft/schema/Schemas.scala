package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the generated Kafka-style records.
  *
  * The reference keeps these implicit in builder calls
  * (reference: DataGenerator.java:474-503); here they are explicit
  * `StructType`s so `from_json` never infers (SURVEY §1.6).
  */
object Schemas {

  /** Record key — reference DataGenerator.java:474-480.
    * Fields are declared nullable to match `from_json` output semantics. */
  val keySchema: StructType = StructType(Seq(
    StructField("storeId", StringType, nullable = true),
    StructField("operatorId", StringType, nullable = true),
    StructField("messageId", StringType, nullable = true)
  ))

  /** Beer element — reference DataGenerator.java:468-472. */
  val beerSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = true),
    StructField("style", StringType, nullable = true)
  ))

  /** Address — reference DataGenerator.java:489-494. */
  val addressSchema: StructType = StructType(Seq(
    StructField("number", StringType, nullable = true),
    StructField("street", StringType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("region", StringType, nullable = true),
    StructField("postalCode", StringType, nullable = true)
  ))

  /** Record value — reference DataGenerator.java:482-503.
    * `timestamp`/`birthDate` are ISO-8601 *strings* on the wire, exactly
    * as the reference emits them.
    */
  val valueSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType, nullable = true),
    StructField("user", StructType(Seq(
      StructField("lastName", StringType, nullable = true),
      StructField("firstName", StringType, nullable = true),
      StructField("birthDate", StringType, nullable = true),
      StructField("address", addressSchema, nullable = true),
      StructField("favoriteBeers", ArrayType(beerSchema, containsNull = true), nullable = true)
    )), nullable = true),
    StructField("payload", StringType, nullable = true)
  ))

  /** Kafka `headers` column shape — reference DataGenerator.java:509-510
    * mapped per SURVEY §1.6.
    */
  val headersSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("value", BinaryType, nullable = true)
  )), containsNull = true)
}
