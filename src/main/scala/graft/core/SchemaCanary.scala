package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Testdata layout canary: asserts the engine's schema assumptions
  * against each table's parquet FOOTER (schema-only reads — no data
  * scan), so a driver-side testdata regeneration that drifts a column
  * costs ONE readable failure naming the drifted column, instead of a
  * pile of cryptic AnalysisExceptions and — the dangerous variant —
  * silently wrong streaming answers (round 8: `events.ts` moved from
  * int64 TIMESTAMP(NANOS) to timestamp[us] and 19 gates went red, 6 of
  * them with wrong answers rather than errors).
  *
  * Expectations are TYPE FAMILIES, not exact physical types: the engine
  * adapts to any member of a family (e.g. `events.ts` accepts epoch-nanos
  * long / timestamp[us] NTZ / UTC-adjusted timestamp via
  * [[EventsLayout]]), so the canary only fires on drift the engine
  * genuinely cannot absorb.
  *
  * Mains ([[graft.Verify]], [[graft.Bench]]) WARN loudly and continue —
  * a canary false-positive must never zero a whole correctness round on
  * its own; the test suite asserts no problems, so drift also fails
  * `sbt test` with the readable message.
  */
object SchemaCanary {

  private val integral: DataType => Boolean = {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private val fractional: DataType => Boolean = {
    case FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }
  private val string: DataType => Boolean = _ == StringType
  /** The [[EventsLayout]] accepted set. */
  private val eventTs: DataType => Boolean = {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  private val dateish: DataType => Boolean = {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  private val floatArray: DataType => Boolean = {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def fam(p: DataType => Boolean): String = p match {
    case `integral` => "integral"
    case `fractional` => "fractional"
    case `string` => "string"
    case `eventTs` => "epoch-nanos long | timestamp[us] (NTZ or UTC)"
    case `dateish` => "date | timestamp"
    case `floatArray` => "array<float|double>"
    case _ => "?"
  }

  /** table -> required columns -> accepted type family. */
  private val expected: Map[String, Map[String, DataType => Boolean]] = Map(
    "region" -> Map("r_regionkey" -> integral, "r_name" -> string),
    "nation" -> Map("n_nationkey" -> integral, "n_name" -> string,
      "n_regionkey" -> integral),
    "customer" -> Map("c_custkey" -> integral, "c_name" -> string,
      "c_nationkey" -> integral, "c_acctbal" -> fractional,
      "c_mktsegment" -> string),
    "supplier" -> Map("s_suppkey" -> integral, "s_name" -> string,
      "s_nationkey" -> integral, "s_acctbal" -> fractional),
    "part" -> Map("p_partkey" -> integral, "p_name" -> string,
      "p_brand" -> string, "p_type" -> string, "p_size" -> integral,
      "p_retailprice" -> fractional),
    "orders" -> Map("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> string, "o_totalprice" -> fractional,
      "o_orderdate" -> dateish, "o_orderpriority" -> string),
    "lineitem" -> Map("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> fractional, "l_extendedprice" -> fractional,
      "l_discount" -> fractional, "l_tax" -> fractional,
      "l_returnflag" -> string, "l_linestatus" -> string,
      "l_shipdate" -> dateish),
    "events" -> Map("event_id" -> integral, "ts" -> eventTs,
      "user_id" -> integral, "event_type" -> string,
      "value" -> fractional, "props" -> string),
    "documents" -> Map("doc_id" -> integral, "text" -> string,
      "lang" -> string, "source" -> string, "n_chars" -> integral),
    "embeddings" -> Map("vec_id" -> integral, "embedding" -> floatArray,
      "label" -> integral))

  /** Every drifted assumption in `dir`, one readable line each; empty =
    * the engine's assumptions hold. The session conf is left exactly as
    * found — the canary only footer-reads, so the legacy nanos flag it
    * needs for TIMESTAMP(NANOS) footers never outlives the call. */
  def problems(spark: SparkSession, dir: String): Seq[String] =
    EventsLayout.withNanosFlag(spark) { restore =>
      try problemsUnderFlag(spark, dir) finally restore()
    }

  private def problemsUnderFlag(spark: SparkSession, dir: String): Seq[String] = {
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$dir/$table.parquet"
      val schema =
        try Right(spark.read.parquet(path).schema)
        catch { case scala.util.control.NonFatal(e) =>
          Left(s"$table: unreadable at $path (${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.toSeq.headOption.getOrElse("")})")
        }
      schema match {
        case Left(p) => Seq(p)
        case Right(s) =>
          cols.toSeq.sortBy(_._1).flatMap { case (c, accept) =>
            s.fields.find(_.name == c) match {
              case None => Some(s"$table.$c: column MISSING " +
                s"(found: ${s.fieldNames.mkString(", ")})")
              case Some(f) if !accept(f.dataType) =>
                Some(s"$table.$c: type ${f.dataType.simpleString} outside " +
                  s"the accepted family [${fam(accept)}] — engine " +
                  "assumptions need updating before results can be trusted")
              case Some(f) if table == "events" && c == "ts" &&
                  f.dataType == LongType =>
                longTsPlausible(spark, path)
              case _ => None
            }
          }
      }
    }
  }

  /** A LongType `ts` passes the type-family check whether it holds epoch
    * NANOS (what [[EventsLayout.normalize]] assumes: `ts div 1000` →
    * micros) or — the silent-wrong-answer drift — epoch millis/micros in a
    * plain BIGINT, which the same decode would misplace by 1000–1000000×.
    * Cheap sanity probe: read ONE row (single row group, single column)
    * and require the nanos interpretation to land in a plausible year. */
  private def longTsPlausible(spark: SparkSession, path: String): Option[String] = {
    val one = spark.read.parquet(path).select("ts").limit(1).collect()
    one.headOption.filterNot(_.isNullAt(0)).map(_.getLong(0)).flatMap { v =>
      def year(sec: Long): Int =
        java.time.Instant.ofEpochSecond(sec).atZone(java.time.ZoneOffset.UTC).getYear
      val asNanos = year(Math.floorDiv(v, 1000000000L))
      if (asNanos >= 1990 && asNanos <= 2100) None
      else {
        val guess = Seq("micros" -> 1000000L, "millis" -> 1000L)
          .collectFirst { case (u, d)
            if { val y = year(Math.floorDiv(v, d)); y >= 1990 && y <= 2100 } => u }
          .getOrElse("unknown-unit")
        Some(s"events.ts: long value $v decodes to year $asNanos under the " +
          s"epoch-NANOS interpretation the engine assumes — looks like epoch " +
          s"$guess; normalize would misdecode every timestamp")
      }
    }
  }

  /** Mains call this at startup: loud stderr report, never aborts (see
    * class doc for why). Returns whether the layout is clean. */
  def warn(spark: SparkSession, dir: String): Boolean = {
    val ps = problems(spark, dir)
    ps.foreach(p => System.err.println(s"[schema-canary] $p"))
    if (ps.nonEmpty)
      System.err.println(s"[schema-canary] ${ps.size} drifted assumption(s) " +
        s"in $dir — results involving those columns are UNTRUSTWORTHY")
    ps.isEmpty
  }
}
