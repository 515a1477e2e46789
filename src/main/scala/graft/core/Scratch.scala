package graft.core

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Write-once scratch directories for derived fixtures (CSV/JSON/ORC/text
  * copies of the test tables, split streaming sources).
  *
  * Keying: `<name>_<key>` where the key folds together (a) a fingerprint
  * of the SOURCE directory — regenerated data changes it — and (b) a hash
  * of the derivation's SCHEMA (or DDL) — a code change to what gets
  * written changes it. Either change busts the cache, so a `_SUCCESS`
  * guard can never serve stale or mis-shaped fixtures.
  *
  * Pruning: creating a new generation deletes stale sibling generations
  * of the same name (same `<name>_` prefix, different key), so repeated
  * regenerate-and-run cycles don't accumulate corpus copies in /tmp.
  * (Single-writer assumption: the harness runs one JVM at a time against
  * a scratch root; concurrent processes racing the prune would need a
  * lock this deliberately doesn't take.)
  */
object Scratch {

  def sha8(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Key = source-dir fingerprint + derivation-schema hash. */
  def key(spark: SparkSession, srcDir: String, derivation: String): String =
    graft.olist.OlistMaterialized.fingerprint(spark, srcDir).take(12) +
      "-" + sha8(derivation)

  /** Resolve `<base>/<name>_<key>`, pruning stale generations of `name`. */
  def dir(base: String, name: String, key: String): Path = {
    val parent = Paths.get(base)
    val target = s"${name}_$key"
    if (Files.isDirectory(parent)) {
      val it = Files.list(parent)
      try {
        it.iterator().forEachRemaining { p =>
          val fn = p.getFileName.toString
          if (fn.startsWith(s"${name}_") && fn != target) deleteRecursively(p)
        }
      } finally it.close()
    }
    parent.resolve(target)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val it = Files.list(p)
      try it.iterator().forEachRemaining(deleteRecursively)
      finally it.close()
    }
    Files.deleteIfExists(p)
  }
}
