package graft.schema

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col => sqlCol, element_at, lit, map_filter}
import org.apache.spark.sql.types._

/**
 * Compile-time Scala-type → Catalyst-type evidence — the analogue of the
 * reference's `ByteConverter[T]` registry (reference:
 * src/main/scala/com/gravity/hbase/schema/ByteConverter.scala:24, where the
 * converter instance IS the column's type witness), except resolution happens
 * at compile time and the "serialization" is Catalyst's own encoders.
 */
sealed trait SparkType[T] { def dataType: DataType }
object SparkType {
  private def st[T](dt: DataType): SparkType[T] = new SparkType[T] { val dataType: DataType = dt }
  implicit val ofString: SparkType[String] = st(StringType)
  implicit val ofLong: SparkType[Long] = st(LongType)
  implicit val ofInt: SparkType[Int] = st(IntegerType)
  implicit val ofDouble: SparkType[Double] = st(DoubleType)
  implicit val ofFloat: SparkType[Float] = st(FloatType)
  implicit val ofBoolean: SparkType[Boolean] = st(BooleanType)
  implicit val ofDate: SparkType[java.sql.Date] = st(DateType)
  implicit val ofTimestamp: SparkType[java.sql.Timestamp] = st(TimestampType)
  implicit val ofBytes: SparkType[Array[Byte]] = st(BinaryType)
  implicit def ofSeq[T](implicit e: SparkType[T]): SparkType[Seq[T]] = st(ArrayType(e.dataType))
}

/**
 * A compile-time-checked column reference: `web.meta.title` is a field access
 * on a singleton object, so a typo (`web.meta.titel`) or a wrongly-typed
 * comparison (`web.meta.title === 3`) fails compilation — the reference's
 * headline guarantee ("compiler-checked" projections via `(T) => Column`
 * lambdas, reference HbaseTable.scala:333-361, README.markdown:12), delivered
 * through Scala object structure instead of lambda reflection.
 *
 * Comparison operators take `T`, so the literal side is type-checked too —
 * `web.meta.title === 3` is a compile error. There is deliberately NO implicit
 * conversion to [[Column]]: one would reintroduce `Column`'s untyped operators
 * as a silent fallback and void the literal check. Use `.column` (or the
 * Column-returning operators here) where a plain Column is needed.
 */
final class TypedCol[T] private[schema] (
    val family: Option[String], val name: String, val dataType: DataType) {
  /** The Catalyst reference: `family.name` resolves struct-field access. */
  def column: Column = sqlCol(qualified)
  def qualified: String = family.map(f => s"$f.$name").getOrElse(name)

  def ===(v: T): Column = column === lit(v)
  def =!=(v: T): Column = column =!= lit(v)
  def >(v: T): Column = column > lit(v)
  def >=(v: T): Column = column >= lit(v)
  def <(v: T): Column = column < lit(v)
  def <=(v: T): Column = column <= lit(v)
  def in(vs: T*): Column = column.isin(vs.map(_.asInstanceOf[Any]): _*)
  def between(lo: T, hi: T): Column = column >= lit(lo) && column <= lit(hi)
  def isNull: Column = column.isNull
  def isNotNull: Column = column.isNotNull
  def as(alias: String): Column = column.as(alias)
}

/**
 * Schema-object table DSL — the typed twin of [[TableDef]]. Declare families
 * and columns as `val`s (eager init registers them in declaration order into
 * an underlying [[TableDef]], which supplies `schema`/`createScript` etc.):
 *
 * {{{
 * object web extends TypedTableDef[String]("web_table") {
 *   class Meta extends Family("meta") {            // named class, not an
 *     val title = col[String]("title")             // anonymous subclass —
 *     val lastCrawled = col[java.sql.Timestamp]("lastCrawled") // keeps member
 *   }                                              // access nominal (no
 *   val meta = new Meta                            // structural reflection)
 *   val searchesByDay = new DynFamily[java.sql.Date, Long]("searchesByDay")
 * }
 * web.meta.title === "A"        // checked ref, checked literal type
 * web.searchesByDay(someDay)    // qualifier access, key type checked
 * }}}
 *
 * Mirrors the reference's `class WebTable extends HbaseTable[...] { val meta =
 * family[...]; val title = column(meta, "title", classOf[String]) }`
 * (reference src/test/.../WebCrawlSchemaTest.scala:22-41).
 */
abstract class TypedTableDef[K](val tableName: String)(implicit kt: SparkType[K]) {

  private val underlying: TableDef = TableDef(tableName, kt.dataType)

  /** The row key, typed — `web.key === url` checks the key's Scala type. */
  val key: TypedCol[K] = new TypedCol[K](None, "key", kt.dataType)

  /** A fixed family: declare typed columns inside (reference `family[...]`). */
  protected class Family(val familyName: String, compressed: Boolean = false,
      versions: Int = 1, ttlSeconds: Int = Int.MaxValue) {
    underlying.family(familyName, compressed, versions, ttlSeconds)
    /** Whole-family projection (struct column). */
    def column: Column = sqlCol(familyName)
    protected def col[T](colName: String)(implicit t: SparkType[T]): TypedCol[T] = {
      underlying.col(familyName, colName, t.dataType)
      new TypedCol[T](Some(familyName), colName, t.dataType)
    }
  }

  /** A dynamic family: `map<FK, FV>` whose qualifiers are data; access is
    * typed on the qualifier (reference `family[DateMidnight, Long]`). */
  protected class DynFamily[FK, FV](val familyName: String,
      withCellTimestamps: Boolean = false, compressed: Boolean = false,
      versions: Int = 1, ttlSeconds: Int = Int.MaxValue)(
      implicit fk: SparkType[FK], fv: SparkType[FV]) {
    underlying.dynFamily(familyName, fk.dataType, fv.dataType, withCellTimestamps,
      compressed, versions, ttlSeconds)
    def column: Column = sqlCol(familyName)
    /** Typed qualifier lookup: `searchesByDay(day)`. */
    def apply(q: FK): Column = element_at(column, lit(q))
    /** Qualifier-range sub-map (P10 semantics, keys in [lo, hi]). */
    def betweenKeys(lo: FK, hi: FK): Column =
      map_filter(column, (k, _) => k >= lit(lo) && k <= lit(hi))
    /** The sibling per-cell timestamp map, when declared. */
    def tsColumn: Column = sqlCol(s"${familyName}_ts")
  }

  /** The untyped twin — schema, DataFrame builders, DDL emission. */
  def tableDef: TableDef = underlying
  def schema: StructType = underlying.schema
  def empty(spark: SparkSession): DataFrame = underlying.empty(spark)
  def fromRows(spark: SparkSession, rows: Seq[Row]): DataFrame = underlying.fromRows(spark, rows)
}
