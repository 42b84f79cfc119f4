package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Shared firing guard for the transparent-acceleration optimizer
  * rules ([[TrigramContainsRewrite]], [[AnnTopKRewrite]]): a plan
  * subtree qualifies for index-candidate pruning only when EVERY leaf
  * is a scan of the indexed corpus location AND the scanned file set
  * is exactly the one snapshotted when the rule was installed.
  *
  *  - leaf-only (never `exists` over the subtree — ADVICE r15): a
  *    union/join mixing the corpus with another source must not be
  *    pruned, since the store answers only for documents it indexed;
  *  - freshness (ADVICE r15): a corpus appended or overwritten after
  *    the index build has rows the store never saw — the guard fails
  *    and the query falls back to the honest full scan rather than
  *    silently omitting them. The snapshot is data-file paths + total
  *    bytes, captured once at enable time (parquet writers emit fresh
  *    part-file names, so both append and overwrite change the set);
  *    comparing against the relation's OWN file index costs nothing
  *    at plan time — no re-listing per query.
  */
private[plans] final class ScanGuard(spark: SparkSession, corpusPath: String) {

  private val corpusTail = normalize(corpusPath)

  /** Enable-time corpus snapshot (data-file paths + total bytes).
    * Hidden files (`_SUCCESS`, `.crc`) are excluded with the same rule
    * Spark's file index applies. */
  private val snapshot: (Set[String], Long) = {
    val p = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = scala.collection.mutable.Set.empty[String]
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        files += st.getPath.toUri.getPath
        bytes += st.getLen
      }
    }
    (files.toSet, bytes)
  }

  private def normalize(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  private def corpusScan(lr: LogicalRelation): Boolean = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.exists(rp =>
        normalize(rp.toUri.getPath) == corpusTail ||
          normalize(rp.toString) == corpusTail) && {
        val seen = fs.location.inputFiles
          .map(s => new org.apache.hadoop.fs.Path(s).toUri.getPath).toSet
        seen == snapshot._1 && fs.location.sizeInBytes == snapshot._2
      }
    case _ => false
  }

  /** EVERY leaf of the subtree is the (fresh) corpus scan. */
  def onlyScansCorpus(plan: LogicalPlan): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation => corpusScan(lr)
      case _ => false
    }
  }
}
