package graft.operators

import graft.functions.ConceptDict
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Knowledge-graph edge/node export.
  *
  * The reference's end product is a Biolink-model knowledge graph: concept
  * cooccurrence scores become TRAPI edges (reference: kg/ontology_kg
  * OntologyToKgx, trapi package, util/BiolinkConstants.java — concept
  * prefix → biolink category mapping; doc/bigquery cooccurrence schema).
  * Here: nodes = dictionary concepts with a category from their group;
  * edges = metric-scored cooccurrence pairs with a relatedness predicate.
  */
object KnowledgeGraph {

  /** group prefix → category (BiolinkConstants analog, single source of truth
    * shared with the oracle via categoryCaseSql). */
  val categories: Map[String, String] = Map(
    "OP" -> "graft:Operation",
    "DS" -> "graft:DataShape",
    "SZ" -> "graft:Qualifier",
    "ENT" -> "graft:Entity")

  def categoryFor(conceptCol: String): org.apache.spark.sql.Column =
    categories.foldLeft(lit("graft:NamedThing")) { case (acc, (p, cat)) =>
      when(substring_index(col(conceptCol), ":", 1) === p, lit(cat)).otherwise(acc)
    }

  def categoryCaseSql(c: String): String = {
    val whens = categories.map { case (p, cat) =>
      s"WHEN split_part($c, ':', 1) = '$p' THEN '$cat'"
    }.mkString(" ")
    s"(CASE $whens ELSE 'graft:NamedThing' END)"
  }

  /** Transitive closure of a (child, parent) edge set by iterative
    * self-join to fixpoint (reference: corpora/semmed/CreateUmlsSubclassOntology
    * + util/OntologyClassAncestorMapFactory derive ancestor closures from
    * direct subclass edges). Spark has no recursive CTE; the idiomatic
    * formulation is a driver loop of join+union+distinct, O(depth)
    * iterations. At 100 TB each iteration is one shuffle and intermediate
    * results should be checkpointed every few rounds to cut lineage. */
  def transitiveClosure(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    // localCheckpoint truncates lineage per round (persist alone would let
    // the plan double every iteration on deep graphs — see
    // Dedup.connectedComponents for the same pattern)
    var closure = edges.select(col("child"), col("parent")).distinct().localCheckpoint()
    var n = closure.count()
    var grew = true
    var iter = 0
    while (grew && iter < maxIterations) {
      val step = closure.as("c")
        .join(edges.as("e"), col("c.parent") === col("e.child"))
        .select(col("c.child").as("child"), col("e.parent").as("parent"))
      val next = closure.unionByName(step).distinct().localCheckpoint()
      val m = next.count()
      grew = m > n
      n = m
      closure = next
      iter += 1
    }
    closure
  }

  /** The dictionary ontology's ancestor closure from its direct edges. */
  def ontologyClosure(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    transitiveClosure(graft.functions.ConceptDict.directEdges.toDF("child", "parent"))
  }

  /** Node table: concept_id, name, category. */
  def nodes(spark: org.apache.spark.sql.SparkSession): DataFrame =
    ConceptDict.dictDF(spark)
      .select(col("concept_id"), col("tok").as("name"), categoryFor("concept_id").as("category"))

  /** Edge table from document-level cooccurrence metrics: subject, object,
    * predicate, subject_category, object_category, pair_count, ngd, npmi. */
  def edges(annots: DataFrame): DataFrame =
    Cooccurrence.metrics(annots, Seq("doc_id"))
      .select(
        col("concept1").as("subject"),
        col("concept2").as("object"),
        lit("graft:related_to").as("predicate"),
        categoryFor("concept1").as("subject_category"),
        categoryFor("concept2").as("object_category"),
        col("pair_count"), col("ngd"), col("npmi"))
}
