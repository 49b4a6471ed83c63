package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic aggregate helpers. */
object Agg {

  /** Order-preserving string aggregation: the Spark dual of SQL
    * `string_agg(value, sep ORDER BY order)`. collect_list order is
    * nondeterministic, so values are carried with their order key and sorted
    * before joining; `order` must be unique within the group. */
  def orderedStringAgg(order: Column, value: Column, sep: String): Column =
    array_join(
      transform(array_sort(collect_list(struct(order.as("o"), value.as("v")))), s => s("v")),
      sep)
}
