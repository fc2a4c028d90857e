package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the generated Kafka-style records.
  *
  * The reference keeps these implicit in builder calls
  * (reference: DataGenerator.java:474-503); here they are explicit
  * `StructType`s so `from_json` never infers (SURVEY §1.6).
  */
object Schemas {

  /** Record key — reference DataGenerator.java:474-480. */
  val keySchema: StructType = StructType(Seq(
    StructField("storeId", StringType, nullable = false),
    StructField("operatorId", StringType, nullable = false),
    StructField("messageId", StringType, nullable = false)
  ))

  /** Beer element — reference DataGenerator.java:468-472. */
  val beerSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("style", StringType, nullable = false)
  ))

  /** Address — reference DataGenerator.java:489-494. */
  val addressSchema: StructType = StructType(Seq(
    StructField("number", StringType, nullable = false),
    StructField("street", StringType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("region", StringType, nullable = false),
    StructField("postalCode", StringType, nullable = false)
  ))

  /** Record value — reference DataGenerator.java:482-503.
    * `timestamp`/`birthDate` are ISO-8601 *strings* on the wire, exactly
    * as the reference emits them.
    */
  val valueSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType, nullable = false),
    StructField("user", StructType(Seq(
      StructField("lastName", StringType, nullable = false),
      StructField("firstName", StringType, nullable = false),
      StructField("birthDate", StringType, nullable = false),
      StructField("address", addressSchema, nullable = false),
      StructField("favoriteBeers", ArrayType(beerSchema, containsNull = false), nullable = false)
    )), nullable = false),
    StructField("payload", StringType, nullable = false)
  ))

  /** Kafka `headers` column shape — reference DataGenerator.java:509-510
    * mapped per SURVEY §1.6.
    */
  val headersSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = false)
  )), containsNull = false)
}
