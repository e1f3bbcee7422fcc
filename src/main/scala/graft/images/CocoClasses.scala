package graft.images

import org.apache.spark.sql.{DataFrame, SparkSession}

/** M8 — the 80 COCO class names (the reference's `coco_classes.py:1-82`;
  * this is the standard public COCO-2017 label list). Index = model class
  * id, as produced by [[Detection.Detector]].
  */
object CocoClasses {

  /** One label per line, index = COCO-2017 class id. */
  val Names: IndexedSeq[String] =
    """person | bicycle | car | motorcycle | airplane | bus | train | truck
      |boat | traffic light | fire hydrant | stop sign | parking meter
      |bench | bird | cat | dog | horse | sheep | cow | elephant | bear
      |zebra | giraffe | backpack | umbrella | handbag | tie | suitcase
      |frisbee | skis | snowboard | sports ball | kite | baseball bat
      |baseball glove | skateboard | surfboard | tennis racket | bottle
      |wine glass | cup | fork | knife | spoon | bowl | banana | apple
      |sandwich | orange | broccoli | carrot | hot dog | pizza | donut
      |cake | chair | couch | potted plant | bed | dining table | toilet
      |tv | laptop | mouse | remote | keyboard | cell phone | microwave
      |oven | toaster | sink | refrigerator | book | clock | vase
      |scissors | teddy bear | hair drier | toothbrush"""
      .stripMargin.split("[|\n]").iterator.map(_.trim).filter(_.nonEmpty)
      .toIndexedSeq

  def name(cls: Int): String =
    if (cls >= 0 && cls < Names.length) Names(cls) else s"class_$cls"

  /** Tiny lookup dim for joins against exploded prediction maps. */
  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Names.zipWithIndex.map { case (n, i) => (i, n) }.toDF("cls", "class_name")
  }
}
