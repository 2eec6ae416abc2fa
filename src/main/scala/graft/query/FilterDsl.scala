package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Django-ORM-style filter DSL compiled to Catalyst Column predicates.
  *
  * Re-expresses the reference's ResultSet filter operators
  * (nexus/result.py:166-178, dispatch nexus/result.py:389-454) — the same
  * surface its SQLite store compiles to WHERE clauses
  * (nexus/backends/stores/sqlite_store.py:245-282). Everything lowers to
  * built-in Catalyst expressions, so predicate pushdown and codegen apply
  * unchanged; no custom Expression is needed (SURVEY §2.3).
  *
  * Key syntax: `a__b__c` walks nested structs/maps; a trailing segment
  * naming an operator applies it, else exact match:
  *
  *   - `__exact` / bare key  → ===
  *   - `__contains`          → array_contains / string contains
  *   - `__icontains`         → lower(col) contains lower(v)
  *   - `__startswith` / `__endswith`
  *   - `__gt` `__gte` `__lt` `__lte`
  *   - `__in`                → isin
  *   - `__isnull`            → isNull === flag
  *
  * Null semantics follow the reference (nexus/result.py:409-411): a null
  * field fails every operator except isnull — which SQL three-valued
  * logic already gives us, since `null op x` is null and filters out.
  */
object FilterDsl {

  val operators: Set[String] = Set(
    "contains", "startswith", "endswith", "icontains",
    "gt", "gte", "lt", "lte", "in", "exact", "isnull")

  /** Split `a__b__op` into (path, operator). The last segment is an
    * operator only if it names one; otherwise the whole key is a path and
    * the operator is `exact` (nexus/result.py:372-387). */
  def splitKey(key: String): (Seq[String], String) = {
    val parts = key.split("__").toSeq
    if (parts.size > 1 && operators.contains(parts.last))
      (parts.init, parts.last)
    else (parts, "exact")
  }

  /** Resolve a nested path against the schema: structs via field access,
    * maps via element_at. Missing fields become null columns (reference
    * returns None for missing paths, nexus/result.py:338-360). */
  private def resolve(df: DataFrame, path: Seq[String]): (Column, Option[DataType]) = {
    var c: Column = null
    var dt: Option[DataType] = Some(df.schema)
    path.foreach { seg =>
      val next: Option[DataType] = dt flatMap {
        case s: StructType => s.fields.find(_.name == seg).map(_.dataType)
        case m: MapType    => Some(m.valueType)
        case _             => None
      }
      c = (dt, next) match {
        case (Some(_: StructType), Some(_)) => if (c == null) df(seg) else c.getField(seg)
        case (Some(_: MapType), _)          => element_at(c, seg)
        case _ => if (c == null) lit(null) else lit(null) // unresolvable path
      }
      dt = next
    }
    (c, dt)
  }

  def compile(df: DataFrame, key: String, value: Any): Column = {
    val (path, op) = splitKey(key)
    val (col0, dtOpt) = resolve(df, path)
    val v = lit(value)
    op match {
      case "exact" => col0 === v
      case "contains" =>
        dtOpt match {
          case Some(_: ArrayType) => array_contains(col0, value)
          case Some(_: MapType)   => map_contains_key(col0, value)
          case _                  => col0.contains(v)
        }
      case "icontains"  => lower(col0).contains(lower(v))
      case "startswith" => col0.startsWith(v)
      case "endswith"   => col0.endsWith(v)
      case "gt"         => col0 > v
      case "gte"        => col0 >= v
      case "lt"         => col0 < v
      case "lte"        => col0 <= v
      case "in" =>
        value match {
          case xs: Seq[_]      => col0.isin(xs: _*)
          case xs: Array[_]    => col0.isin(xs.toSeq: _*)
          case xs: Iterable[_] => col0.isin(xs.toSeq: _*)
          case x               => col0.isin(x)
        }
      case "isnull" =>
        val flag = value match {
          case b: Boolean => b
          case other      => other != null
        }
        if (flag) col0.isNull else col0.isNotNull
      case other =>
        throw new IllegalArgumentException(s"Unknown filter operator '$other'")
    }
  }

  /** AND-combine a full filter map (reference filter(**kwargs) semantics). */
  def compileAll(df: DataFrame, filters: Seq[(String, Any)]): Column =
    filters.map { case (k, v) => compile(df, k, v) }
      .reduceOption(_ && _).getOrElse(lit(true))
}
