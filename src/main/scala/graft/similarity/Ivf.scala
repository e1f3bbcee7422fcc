package graft.similarity

import graft.plans.VectorExpressions.{dot_long, quantize_vec}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: a seeded k-means coarse quantizer partitions
  * the candidate set into cells; queries probe their `nProbe` nearest cells
  * and exact-rerank only those candidates.
  *
  * This is the second scale path next to [[Similarity.lshTopK]]: IVF cells
  * adapt to the data distribution (better recall/candidate ratio on
  * clustered embeddings), at the cost of a training pass. Index build =
  * one KMeans fit + one assignment pass, both distributed; probe = an
  * equi-join on cell id — no cross join anywhere.
  */
object Ivf {

  final case class Index(centers: Seq[Seq[Double]], assigned: DataFrame)

  /** Build the coarse index: fit seeded k-means on the embeddings, assign
    * every candidate to its cell. `assigned` carries pre-quantized vectors
    * + norms so the probe phase never touches floats again.
    */
  def build(candidates: DataFrame, nCells: Int, seed: Long = 42L): Index = {
    val vecs = candidates.select(col("vec_id"),
      col("embedding"), array_to_vector(col("embedding")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("embedding"),
        col(model.getPredictionCol).as("cell"))
      .select(col("vec_id"), col("cell"),
        quantize_vec(col("embedding")).as("q"))
      .select(col("vec_id"), col("cell"), col("q"),
        sqrt(dot_long(col("q"), col("q")).cast("double")).as("nrm"))
    Index(model.clusterCenters.map(_.toArray.toSeq).toSeq, assigned)
  }

  /** Squared L2 distance from an embedding column to a literal center. */
  private def distSq(e: Column, center: Seq[Double]): Column =
    aggregate(
      zip_with(e, lit(center.toArray), (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, x) => acc + x)

  /** The `nProbe` nearest cell ids for each query embedding, as an array
    * column (centers are plan literals — tiny).
    */
  def probeCells(e: Column, centers: Seq[Seq[Double]], nProbe: Int): Column = {
    val scored = centers.zipWithIndex.map { case (c, i) =>
      struct(distSq(e, c).as("d"), lit(i).as("cell"))
    }
    transform(
      slice(array_sort(array(scored: _*)), 1, nProbe),
      s => s.getField("cell"))
  }

  /** Probe + exact rerank: top-k by quantized cosine among candidates in
    * the probed cells.
    */
  def topK(queries: DataFrame, index: Index, k: Int, nProbe: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("query_id"),
        quantize_vec(col("embedding")).as("qq"),
        explode(probeCells(col("embedding"), index.centers, nProbe)).as("cell"))
      .select(col("query_id"), col("qq"), col("cell"),
        sqrt(dot_long(col("qq"), col("qq")).cast("double")).as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    index.assigned.as("c").join(q.as("qs"), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        col("vec_id").as("neighbor_id"),
        (dot_long(col("qq"), col("q")).cast("double") / (col("qn") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }
}
