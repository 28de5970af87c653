package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005): point frequency
  * estimates from a d×w counter grid — `est(x) = min_r grid[r][h_r(x)]`,
  * never an undercount, overcounts bounded by collisions (ε ≈ e/w with
  * probability 1−e^−d). The sketch state is ≤ d·w rows REGARDLESS of
  * corpus size — the frequency analogue of [[Kmv]]'s distinct sketch, and
  * the structure a 100 TB pipeline ships to a coordinator instead of a
  * full term histogram.
  *
  * Hashing is the engine-portable md5 trick ([[Kmv.keyHash]]), so an
  * external engine replays estimates bit-for-bit.
  *
  * Plan shape: the build is one explode(d slots)+groupBy with map-side
  * partial aggregation — the shuffle carries ≤ d·w groups; estimation is
  * a broadcast-sized left join of the queried keys' slots. */
object Cms {

  /** Row `r`'s slot for key `c`: md5(key '#' r) leading 60 bits mod w. */
  def slotHash(c: Column, r: Int, w: Int): Column =
    conv(substring(md5(concat(c.cast("string"), lit("#" + r))), 1, 15), 16, 10)
      .cast("long") % w

  /** Build the sketch over one occurrence column: a (r, pos, cnt) frame
    * with ≤ d·w rows. Every input ROW counts once per hash row (this is a
    * frequency sketch — do not pre-distinct). */
  def sketch(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, "bad sketch shape")
    df.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), slotHash(col(keyCol), r, w).as("pos"))): _*))
        .as("s"))
      .groupBy(col("s.r").as("r"), col("s.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the keys in `keys(keyCol)`: min over the d
    * counters each key hashes to; a slot no key ever hit counts 0.
    * Output: (key, est). */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: String,
               d: Int, w: Int): DataFrame =
    keys.select(col(keyCol).as("key"))
      .select(col("key"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), slotHash(col("key"), r, w).as("pos"))): _*))
        .as("s"))
      .select(col("key"), col("s.r").as("r"), col("s.pos").as("pos"))
      .join(sk, Seq("r", "pos"), "left_outer")
      .na.fill(0L, Seq("cnt"))
      .groupBy("key").agg(min(col("cnt")).as("est"))
}
