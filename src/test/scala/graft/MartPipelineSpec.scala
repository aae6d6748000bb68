package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Operators
import graft.sources.Ingest

/** End-to-end mart build: the full RDW data path chained on real
  * operators — ingest with validation split, tombstone-aware migrate,
  * tenant-partitioned mart write, tenant-scoped pruned read, embargo
  * gate. A user of the reference runs exactly this sequence
  * (Import Service → Exam Processor → Migrate → Reporting); this spec
  * proves the engine's pieces compose, not just pass in isolation.
  */
class MartPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ingest → validate → migrate(with deletes) → tenant mart → pruned scoped query") {
    // 1. ingest: an exam batch with one malformed row
    val dir = Files.createTempDirectory("graft_e2e").toFile
    val csv = new java.io.File(dir, "exams.csv")
    Files.writeString(csv.toPath,
      """tenant,student_id,exam_id,submitted,score,deleted
        |district_a,1,100,2024-01-01 10:00:00,50.0,false
        |district_a,1,101,2024-02-01 10:00:00,60.0,false
        |district_a,2,102,2024-01-15 10:00:00,70.0,false
        |district_b,3,103,2024-01-20 10:00:00,80.0,false
        |district_b,3,oops,notatime,bad,false
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "tenant string, student_id long, exam_id long, submitted timestamp, " +
        "score double, deleted boolean")
    val (valid, rejected) = Ingest.validationSplit(
      Ingest.readCsvStrictHeader(spark, csv.getAbsolutePath, schema))
    assert(valid.count() == 4 && rejected.count() == 1)

    // 2. migrate: a later batch re-submits student 1's exam and
    // tombstones student 2 — latest-wins + soft delete
    val updates = Seq(
      ("district_a", 1L, 104L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 65.0, false),
      ("district_a", 2L, 105L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 0.0, true)
    ).toDF("tenant", "student_id", "exam_id", "submitted", "score", "deleted")
    val mart = Operators.migrateWithDeletes(valid, updates,
      keys = Seq(col("tenant"), col("student_id")),
      ordering = Seq(col("submitted").desc, col("exam_id").desc))
    val martRows = mart.select("tenant", "student_id", "exam_id", "score")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(martRows == Set(
      ("district_a", 1L, 104L, 65.0),  // re-submission won
      ("district_b", 3L, 103L, 80.0))) // untouched; student 2 tombstoned

    // 3. tenant-partitioned mart write + scoped read with pruning
    val martPath = new java.io.File(dir, "mart").getAbsolutePath
    Ingest.writeTenantPartitioned(mart, martPath, "tenant")
    val scoped = Ingest.forTenant(spark, martPath, "tenant", "district_a")
    assert(scoped.count() == 1)
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("tenant")),
      s"tenant read must prune partitions:\n$plan")

    // 4. embargo gate on the scoped mart (district_a still Reviewing →
    // nothing visible; Released → the row appears)
    val reviewing = Seq(("district_a", 1)).toDF("tenant", "embargo")
    assert(Operators.embargoFilter(scoped, reviewing, Seq("tenant"), "embargo",
      visibleStatuses = Seq(2)).count() == 0)
    val released = Seq(("district_a", 2)).toDF("tenant", "embargo")
    assert(Operators.embargoFilter(scoped, released, Seq("tenant"), "embargo",
      visibleStatuses = Seq(2)).count() == 1)

    // 5. the CONTINUOUS form of step 2: the same batches through the
    // incremental bucket-manifest migrate — the mart the stream
    // maintains batch-by-batch equals the one-shot migrateWithDeletes
    // of everything (the Migrate Reporting Service contract)
    val streamRoot = new java.io.File(dir, "stream_mart").getAbsolutePath
    import graft.streaming.StreamingJobs
    assert(StreamingJobs.applyMigrateBatch(valid, 0L, "e2e", streamRoot,
      Seq("tenant", "student_id"), "submitted", "exam_id", nBuckets = 4))
    assert(StreamingJobs.applyMigrateBatch(updates, 1L, "e2e", streamRoot,
      Seq("tenant", "student_id"), "submitted", "exam_id", nBuckets = 4))
    val streamed = StreamingJobs.readMartLatest(spark, streamRoot).get
      .select("tenant", "student_id", "exam_id", "score")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(streamed == martRows,
      s"incrementally maintained mart must equal the one-shot migrate: $streamed vs $martRows")
  }
}
