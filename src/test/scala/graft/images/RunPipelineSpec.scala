package graft.images

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** End-to-end: the full three-script-equivalent pipeline over a synthetic
  * sharded image tree, checked down to the golden stat files and compat
  * CSV (SURVEY §3 lifecycle as one run).
  */
class RunPipelineSpec extends SparkSpec {

  test("RunPipeline produces checkpoints, compat CSV, and golden stats") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_e2e").toString
    val imgDir = s"$root/images"
    for (i <- 0 until 12) {
      val dir = Paths.get(imgDir, s"${i % 2}", s"${i % 3}", s"${i % 4}")
      Files.createDirectories(dir)
      val color = if (i < 8) 0xFF0000 else 0x0000FF
      Files.write(dir.resolve(f"img$i%02d.png"),
        ImageOps.encodePng(ImageOps.Image(40, 40, Array.fill(1600)(color))))
    }
    val labels = (0 until 12).map(i => (f"img$i%02d", if (i < 8) "L1" else "L2"))
      .toDF("id", "landmark_id")
    val names = Seq(("L1", "Alcatraz"), ("L2", "Berlin Tower"))
      .toDF("landmark_id", "name")
    val out = s"$root/out"

    RunPipeline.run(spark, RunPipeline.Config(imgDir, labels, names, out,
      classesOfInterest = Seq(0, 2)))

    // checkpoints exist and are re-readable parquet
    assert(spark.read.parquet(s"$out/predictions").count() == 12)
    assert(spark.read.parquet(s"$out/rollup").count() == 2)
    assert(spark.read.parquet(s"$out/colors").count() == 12)
    // compat CSV carries JSON-encoded maps
    val compat = graft.sources.Sources.readSemicolonCsv(spark, s"$out/results_predictions")
    assert(compat.columns.toSeq == Seq("id", "predictions"))
    assert(compat.count() == 12)
    // the remaining reference interchange files, exact column sets
    val perClass = graft.sources.Sources.readSemicolonCsv(
      spark, s"$out/results_predictions_per_class")
    assert(perClass.columns.toSeq ==
      Seq("landmark_id", "image_count", "predictions_sum", "averages"))
    assert(perClass.count() == 2)
    val dominant = graft.sources.Sources.readSemicolonCsv(spark, s"$out/results_dominant")
    assert(dominant.columns.toSeq == Seq("id", "average_color", "dominant_color"))
    assert(dominant.count() == 12)
    val domCount = graft.sources.Sources.readSemicolonCsv(
      spark, s"$out/results_dominant_count")
    assert(domCount.columns.toSeq == Seq("dominant_color", "count"))
    // golden stat files, reference byte format
    val alpha = Files.readString(Paths.get(out, "stats", "alphabet_count", "2.csv"))
    assert(alpha.startsWith("letter;count\n"))
    // red images → stub class 2 (r=255), one box each, under letter A (L1)
    assert(alpha.contains("A;8"))
    val primary = Files.readString(Paths.get(out, "stats", "closest_primary", "results.csv"))
    assert(primary.split("\n").length == 7) // header + 6 primaries

    // golden headers byte-for-byte, per the reference's write_results calls
    // (`pyspark_stats.py:96-98,198`) — these are what plots.py addresses
    val avg = Files.readString(Paths.get(out, "stats", "alphabet_count_avg", "2.csv"))
    assert(avg.startsWith("letter;avg_count\n"))
    val dogs = Files.readString(Paths.get(out, "stats", "dogs_by_name_length", "2.csv"))
    assert(dogs.startsWith("length_of_landmark_name;avg_detections\n"))
    assert(primary.startsWith("primary_color;count\n"))
    val ppl = Files.readString(
      Paths.get(out, "stats", "people_in_places_with_people", "0.csv"))
    assert(ppl.startsWith("files considered;avg_detections\n"))

    // stage 4: plots.py-parity emission ran against the same tree — every
    // chart exists under the reference's plots/<type>/ layout, and the CSV
    // columns resolved BY NAME (writeAll throws on any header drift)
    for (f <- Seq(
        "plots/closest_primary/results.html",
        "plots/alphabet_count/person.html",
        "plots/alphabet_count_avg/car.html",
        "plots/dogs_by_name_length/car.html",
        "plots/people_in_places_with_people/person.html",
        "plots/alphabet_count/heatmap.html",
        "plots/alphabet_count_avg/heatmap.html",
        "plots/avg_obj_per_city/heatmap.html"))
      assert(Files.exists(Paths.get(out, f)), s"missing $f")
    // the heatmap carries the merged letter axis from the golden CSVs
    val hm = Files.readString(Paths.get(out, "plots", "alphabet_count", "heatmap.html"))
    assert(hm.contains("<th>A</th>") && hm.contains("person"))
    // dashboard embeds only the panels this run's class set produced
    val dash = Files.readString(Paths.get(out, "dash.html"))
    assert(dash.contains("""src="./plots/alphabet_count_avg/person.html""""))
    assert(dash.contains("""src="./plots/closest_primary/results.html""""))
    assert(!dash.contains("dogs_by_name_length/dog.html")) // class 16 not in run
  }

  test("Plots.readStat fails loudly on a header drift (plots.py KeyError parity)") {
    val dir = Files.createTempDirectory("graft_hdr")
    val f = dir.resolve("0.csv")
    Files.writeString(f, "letter;count\nA;1.0\n")
    assert(Plots.readStat(f, "letter", "count") == Seq(("A", 1.0)))
    intercept[IllegalArgumentException] {
      Plots.readStat(f, "letter", "avg_count") // the stale-golden-header bug
    }
  }
}
