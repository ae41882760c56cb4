package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** TQL sequence semantics (SURVEY.md §2.4): GROUP BY reshapes rows into
  * one row of ordered sequences per key (`cpp/query_core/
  * group_statement.hpp:15-119`, across_type time = original row order);
  * UNGROUP explodes sequences back to rows (`ungroup_statement.hpp:15`);
  * EXPAND BY tiles a 2-D tensor into patches (`tql.md:370-386`,
  * `cpp/heimdall_common/spatial_column.hpp:19`).
  *
  * Scale: grouping is one hash-shuffle on the keys with map-side partial
  * collect; order inside a sequence comes from an explicit ordinal column
  * (sort_array over (ord, value) structs), never from ambient row order —
  * ambient order does not survive a shuffle.
  */
object Grouping {

  /** GROUP BY keys -> each valueCol becomes an ordered sequence column.
    * Ordinal ties are broken by the value itself (sort_array over the
    * (ord, value) struct), keeping the sequence deterministic. */
  def groupToSequences(df: DataFrame, keys: Seq[String], ordCol: String,
      valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map { v =>
      transform(
        sort_array(collect_list(struct(col(ordCol).as("o"), col(v).as("v")))),
        s => s.getField("v")).as(s"${v}_seq")
    }
    // no sequence columns referenced -> the group rows are just the keys
    if (aggs.isEmpty) df.select(keys.map(col): _*).distinct()
    else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** GROUP BY ... ACROSS SPACE (`group_statement.hpp:15-19`
    * across_type_t::space; grammar `bison_parser.y:886-888`): samples
    * CONCATENATE along the spatial axis instead of stacking as a
    * sequence — each valueCol becomes one contiguous tensor per key
    * (tile-stitching), still deterministically ordered by the ordinal. */
  def groupAcrossSpace(df: DataFrame, keys: Seq[String], ordCol: String,
      valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map { v =>
      flatten(transform(
        sort_array(collect_list(struct(col(ordCol).as("o"), col(v).as("v")))),
        s => s.getField("v"))).as(s"${v}_cat")
    }
    if (aggs.isEmpty) df.select(keys.map(col): _*).distinct()
    else df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** UNGROUP: explode a sequence column back to rows with 0-based pos */
  def ungroup(df: DataFrame, seqCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ posexplode(col(seqCol)).as(Seq("pos", "value")): _*)

  /** UNGROUP BY c SPLIT n (`ungroup_statement.hpp:18` split_by_number):
    * split each sequence into n equal-length chunks, one output row per
    * chunk with its 0-based chunk position. Pure generator — no shuffle. */
  def ungroupSplitByNumber(df: DataFrame, seqCol: String, n: Int,
      keep: Seq[String]): DataFrame = {
    val cl = (size(col(seqCol)) / n).cast("int")
    val chunks = transform(sequence(lit(0), lit(n - 1)),
      i => slice(col(seqCol), i * cl + 1, cl))
    df.select(keep.map(col) :+ posexplode(chunks).as(Seq("pos", seqCol)): _*)
  }

  /** UNGROUP BY c SPLIT [l1, l2, ...] (`ungroup_statement.hpp:19`
    * split_by_lengths): chunks of the given lengths, in order. */
  def ungroupSplitByLengths(df: DataFrame, seqCol: String, lengths: Seq[Int],
      keep: Seq[String]): DataFrame = {
    val starts = lengths.scanLeft(0)(_ + _)
    val chunks = array(lengths.zip(starts).map { case (len, st) =>
      slice(col(seqCol), st + 1, len)
    }: _*)
    df.select(keep.map(col) :+ posexplode(chunks).as(Seq("pos", seqCol)): _*)
  }

  /** EXPAND BY h w: tile a flat row-major (rows x cols) tensor column into
    * non-overlapping h x w patches (overlap = stride h/2, w/2), emitting
    * (patch_idx, patch) rows. Pure Column composition -> codegen'd; the
    * per-row fanout is a generator (posexplode), not a shuffle. */
  def expandBy(df: DataFrame, tensorCol: String, rows: Int, cols: Int,
      h: Int, w: Int, overlap: Boolean = false, keep: Seq[String] = Nil): DataFrame = {
    val (sr, sc) = if (overlap) (math.max(1, h / 2), math.max(1, w / 2)) else (h, w)
    val nR = (rows - h) / sr + 1
    val nC = (cols - w) / sc + 1
    val patches = array((for { pr <- 0 until nR; pc <- 0 until nC } yield {
      transform(sequence(lit(0), lit(h * w - 1)), k => {
        // Column `/` is fractional division — floor for the row index
        val row = lit(pr * sr) + floor(k / w).cast("int")
        val colI = lit(pc * sc) + (k % w)
        element_at(col(tensorCol), (row * cols + colI + 1).cast("int"))
      })
    }): _*)
    df.select(keep.map(col) :+ posexplode(patches).as(Seq("patch_idx", "patch")): _*)
  }
}
