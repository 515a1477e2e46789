package graft.core

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Write-once scratch directories for derived fixtures (CSV/JSON/ORC/text
  * copies of the test tables, split streaming sources).
  *
  * Keying: `<base>/<name>/<key>` where the key folds together (a) a
  * fingerprint of the SOURCE directory — regenerated data changes it —
  * and (b) a hash of the derivation's SCHEMA (or DDL) — a code change to
  * what gets written changes it. Either change busts the cache, so a
  * `_SUCCESS` guard can never serve stale or mis-shaped fixtures.
  * Generations are scoped in a per-name SUBDIRECTORY so pruning one name
  * can never touch another (under the old flat `<name>_<key>` layout a
  * `_`-prefix sibling — `docs` vs `docs_v2` — was deletable).
  *
  * Pruning: stale sibling generations are deleted only AFTER the new
  * generation's marker exists ([[ensure]]) — pruning at resolve time
  * destroyed the last working generation before the rebuild had
  * succeeded, so a transient write failure left no usable fixture.
  * (Single-writer assumption: the harness runs one JVM at a time against
  * a scratch root; concurrent processes racing the prune would need a
  * lock this deliberately doesn't take.)
  */
object Scratch {

  /** Injective, catalog- and filesystem-safe key for a DATA DIRECTORY:
    * sanitized basename + hash of the full path. Basenames alone
    * collide across parents (/runA/sf0.1 vs /runB/sf0.1 would thrash
    * any write-once cache or table set keyed by them); the hash makes
    * the key unique per actual directory. [A-Za-z0-9_] only, so the
    * key is legal inside table identifiers too. */
  def pathKey(dir: String): String =
    new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9_]", "_") +
      "_" + sha8(dir)

  def sha8(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Key = source-dir fingerprint + derivation-schema hash. */
  def key(spark: SparkSession, srcDir: String, derivation: String): String =
    graft.olist.OlistMaterialized.fingerprint(spark, srcDir).take(12) +
      "-" + sha8(derivation)

  /** Resolve `<base>/<name>/<key>`. Pure path arithmetic — no pruning
    * (see [[ensure]]/[[prune]] for the post-success cleanup).
    */
  def dir(base: String, name: String, key: String): Path =
    Paths.get(base, name, key)

  /** Delete every stale sibling generation of `name` (any key but
    * `keep`). Call only once the new generation is proven good.
    */
  def prune(base: String, name: String, keep: String): Unit = {
    val parent = Paths.get(base, name)
    if (Files.isDirectory(parent)) {
      val it = Files.list(parent)
      try it.iterator().forEachRemaining { p =>
        if (p.getFileName.toString != keep) deleteRecursively(p)
      } finally it.close()
    }
  }

  /** The write-once protocol in one place: resolve the generation dir,
    * run `write` if `marker` (a generation-relative path like
    * `documents/_SUCCESS`) is absent, and prune stale generations only
    * once the marker exists — so a failed rebuild leaves the previous
    * generation intact for the next attempt.
    */
  def ensure(base: String, name: String, key: String, marker: String)
      (write: Path => Unit): Path = {
    val gen = dir(base, name, key)
    if (!Files.exists(gen.resolve(marker))) write(gen)
    if (Files.exists(gen.resolve(marker))) prune(base, name, key)
    gen
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
