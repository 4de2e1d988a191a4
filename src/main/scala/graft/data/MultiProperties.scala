package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-properties and meta-properties — reference: docs/advschema.txt:73-92
  * ("multi-properties… properties on properties"), tc/core/TitanVertexProperty.java
  * (a property is itself an element carrying properties).
  *
  * Columnar form: a LIST/SET-cardinality property key stores
  * `array<struct<value: T, meta: map<string,string>>>` — one column per key,
  * no side table. Each array cell is one TitanVertexProperty: its `value`
  * plus its meta-properties as a string map. Everything below is pure
  * Column expressions (codegen'd higher-order functions are fine here — these
  * are not hot-loop per-token operations but per-element cell scans).
  *
  * Scale: the array rides the element row (no join to read it); explode only
  * when relational output is required, and aggregate after — the same
  * "adjacency-local" layout the reference uses for vertex properties.
  */
object MultiProperties {

  /** One property cell: value + meta-properties. */
  def cell(value: Column, meta: (String, Column)*): Column = {
    val m =
      if (meta.isEmpty) map().cast("map<string,string>")
      else map(meta.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*)
    struct(value.as("value"), m.as("meta"))
  }

  /** Build a multi-property column from a relation of cells: one array per
    * `idCol` group (cardinality LIST — duplicates preserved). */
  def collect(df: DataFrame, idCol: Column, cellCol: Column): DataFrame =
    df.groupBy(idCol.as("id")).agg(collect_list(cellCol).as("cells"))

  /** SET-cardinality add: append a cell unless an equal-valued cell exists
    * (the reference's Cardinality.SET insert semantics). */
  def addValueSet(prop: Column, c: Column): Column =
    when(exists(prop, x => x.getField("value") === c.getField("value")), prop)
      .otherwise(array_append(prop, c))

  /** LIST-cardinality add: always append. */
  def addValueList(prop: Column, c: Column): Column = array_append(prop, c)

  /** Unpivot a multi-property column to (id, value, meta) relation rows —
    * `vertex.properties(key)` iteration. */
  def explodeCells(df: DataFrame, prop: String, idCol: String = "id"): DataFrame =
    df.select(col(idCol), explode(col(prop)).as("__c"))
      .select(col(idCol), col("__c.value").as("value"), col("__c.meta").as("meta"))

  /** Predicate: some cell's meta-property `metaKey` equals `v`
    * (has('key').has('metaKey', v) on the property element). */
  def anyMetaEquals(prop: Column, metaKey: String, v: String): Column =
    exists(prop, c => c.getField("meta").getItem(metaKey) === v)

  /** Keep only cells whose meta-property matches (property-element filter). */
  def cellsWithMeta(prop: Column, metaKey: String, v: String): Column =
    filter(prop, c => c.getField("meta").getItem(metaKey) === v)

  /** All values of the multi-property (meta dropped). */
  def values(prop: Column): Column = transform(prop, _.getField("value"))
}
