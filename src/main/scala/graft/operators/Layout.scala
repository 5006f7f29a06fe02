package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Z-order (Morton) clustering so
  * parquet file-level min/max statistics prune on EITHER of two
  * dimensions. The reference stores raw log lines (no layout control at
  * all — main.go just forwards bytes); a 100 TB analytics corpus lives
  * or dies by how many files a predicate can skip, which is why this is
  * a first-class operator here.
  *
  * `zorderWrite` needs no custom write path: `repartitionByRange` on
  * the z-expression assigns each output file a contiguous z-range
  * (sampled range boundaries — balanced files even under skew), and
  * `sortWithinPartitions` makes every file's (x, y) min/max rectangle
  * compact. Readers are plain `spark.read.parquet` + predicates;
  * pruning comes from parquet stats, not from this library.
  */
object Layout {

  def defs: Seq[QueryDef] = Seq(q73)

  /** Write `df` clustered by the Morton code of (cx, cy) into
    * `numFiles` range-partitioned, internally sorted parquet files.
    */
  def zorderWrite(df: DataFrame, cx: String, cy: String, path: String,
      numFiles: Int): Unit = {
    val z = ZOrder.zvalue2(col(cx), col(cy))
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** q73: Morton codes over orders — x = customer key's low 16 bits,
    * y = order date as days since epoch of the TPC-H date floor. Both
    * engines compute the identical interleave from the same bitwise
    * ops, so the code column is hash-checked, proving the clustering
    * key (not just the layout machinery) is deterministic.
    */
  val q73: QueryDef = QueryDef.checked(
    "q73_zorder_code",
    """WITH b AS (
      |  SELECT o_orderkey,
      |    o_custkey & 65535 AS x0,
      |    datediff('day', DATE '1992-01-01', o_orderdate) & 65535 AS y0
      |  FROM orders),
      |s1 AS (SELECT o_orderkey, x0, y0,
      |  (x0 | (x0 << 8)) & 16711935 AS x1, (y0 | (y0 << 8)) & 16711935 AS y1 FROM b),
      |s2 AS (SELECT o_orderkey, x0, y0,
      |  (x1 | (x1 << 4)) & 252645135 AS x2, (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
      |s3 AS (SELECT o_orderkey, x0, y0,
      |  (x2 | (x2 << 2)) & 858993459 AS x3, (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
      |s4 AS (SELECT o_orderkey, x0, y0,
      |  (x3 | (x3 << 1)) & 1431655765 AS x4, (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3)
      |SELECT o_orderkey, CAST(x0 AS BIGINT) AS x, CAST(y0 AS BIGINT) AS y,
      |  CAST(x4 | (y4 << 1) AS BIGINT) AS z
      |FROM s4 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val x = col("o_custkey").bitwiseAND(lit(65535L))
    val y = datediff(col("o_orderdate"), to_date(lit("1992-01-01")))
      .cast("long").bitwiseAND(lit(65535L))
    Tables.orders(s, d)
      .select(col("o_orderkey"), x.as("x"), y.as("y"),
        ZOrder.zvalue2(x, y).as("z"))
      .orderBy(col("o_orderkey"))
  }
}
