package graft.etl

import java.nio.file.{Files, Path, StandardCopyOption}

/** S12: archive-on-success (`/root/reference/xml_to_rdb.py:32-33,51-56`):
  * a processed input moves to `<parent>/processed/` iff every table loaded
  * cleanly; any failure leaves the file in place for a retry after the
  * next run. The streaming analogue is the file source's
  * `cleanSource=archive` option; this is the batch-driver form.
  */
object Archive {

  /** Returns the archived path when `failedTables` is empty, None when the
    * file stays put.
    */
  def archiveIfClean(file: Path, failedTables: Seq[String]): Option[Path] =
    if (failedTables.nonEmpty) None
    else {
      val processed = file.getParent.resolve("processed")
      Files.createDirectories(processed)
      val dest = processed.resolve(file.getFileName)
      Files.move(file, dest, StandardCopyOption.REPLACE_EXISTING)
      Some(dest)
    }
}
