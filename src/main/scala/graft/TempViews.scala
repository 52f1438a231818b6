package graft

import org.apache.spark.sql.DataFrame

/** SQL-text entry points need a temp view to name a DataFrame; a FIXED
  * view name races under concurrent same-session calls (two threads
  * invoking the same query on different frames cross-bind silently — the
  * q129 lesson, round-7 ADVICE). This helper gives every invocation its
  * own view name and drops the view as soon as `spark.sql` has analyzed
  * the text (analysis binds the relation eagerly, so the returned frame
  * keeps working after the drop). */
object TempViews {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Expose each (frame, prefix) under a unique view name, build the
    * result from those names, then drop the views. */
  def withViews(frames: Seq[(DataFrame, String)])(
      build: Seq[String] => DataFrame): DataFrame = {
    val named = frames.map { case (df, prefix) =>
      (df, s"${prefix}_${seq.incrementAndGet()}")
    }
    named.foreach { case (df, name) => df.createOrReplaceTempView(name) }
    try build(named.map(_._2))
    finally named.foreach { case (df, name) =>
      df.sparkSession.catalog.dropTempView(name)
    }
  }

  /** Single-view convenience form. */
  def withView(df: DataFrame, prefix: String)(
      build: String => DataFrame): DataFrame =
    withViews(Seq(df -> prefix))(names => build(names.head))
}
