package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Packed-long pair keys for basket/co-occurrence mining (q242, q324):
  * each unordered pair (a, b) with a < b from a SORTED item array
  * travels the shuffle as ONE primitive long `a * 2^32 + b` instead of a
  * 2-field struct — roughly half the shuffle bytes on the ~90M
  * support-1 pairs that map-side combine cannot reduce, and the packing
  * is order-preserving (sorted baskets keep a < b), so top-k by
  * (count, a, b) is top-k by (count, packed).
  *
  * The packing is only injective while every item id fits in 31 bits.
  * That held as a comment-only assumption; this helper makes it a
  * runtime guard — one `element_at(items, -1)` comparison per basket
  * (the array is sorted, so the last element is the max), raising an
  * error instead of silently corrupting pair counts if a key space ever
  * outgrows 2^31.
  */
object PackedPairs {

  /** All C(k,2) in-basket pairs of the sorted array column `items`,
    * packed as longs, overflow-guarded per basket. Explode the result.
    * Callers filter `size(items) >= 2` first (empty `sequence` ranges
    * are legal but pointless work).
    */
  def packedUpperPairs(items: String): Column = expr(
    s"""CASE WHEN element_at($items, -1) < 2147483648L THEN
          flatten(transform(sequence(0, size($items) - 2), i ->
            transform(sequence(i + 1, size($items) - 1), j ->
              $items[i] * 4294967296L + $items[j])))
        ELSE raise_error(concat('PackedPairs: item id ',
          cast(element_at($items, -1) as string),
          ' >= 2^31 would corrupt packed pair keys')) END""")
}
