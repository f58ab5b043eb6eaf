package graft.queries

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.{Merge, ParquetTable}
import graft.orchestrate.RunDecision

/** Catalog DML (MERGE ×3 shapes, UPDATE, DELETE — SURVEY §2.4 A7, §2.9
  * D8/D9) and the orchestration decision queries (J2/J3, P7, nested
  * CASE), each over the deterministic [[Fixtures]] so DuckDB can check
  * them with plain CTE SQL.
  */
object CatalogQueries {
  import Merge.src

  val defs: Seq[(String, Q)] = Seq(

    // A7: full MERGE clause family incl. WHEN NOT MATCHED BY SOURCE
    // soft-retire (insert_config.py:202-270 header merge shape).
    "q_merge_upsert" -> Q(
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
        val target = sup.filter(col("s_suppkey") % 3 =!= 1)
          .select(col("s_suppkey"), col("s_name"),
            col("s_acctbal").as("bal"), lit(1).as("IsCurrent"))
        val staging = sup.filter(col("s_suppkey") % 2 === 0)
          .select(col("s_suppkey"), col("s_name"),
            (col("s_acctbal") + 100.0).as("bal"))
        Merge.merge(target, staging, Seq("s_suppkey"),
          whenMatchedUpdate = Map("bal" -> src("bal"), "IsCurrent" -> lit(1)),
          insertDefaults = Map("IsCurrent" -> lit(1)),
          whenNotMatchedBySourceSet = Map("IsCurrent" -> lit(0)))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH tgt AS (
             |  SELECT s_suppkey, s_name, s_acctbal AS bal, 1 AS IsCurrent
             |  FROM supplier WHERE s_suppkey % 3 <> 1),
             |stg AS (
             |  SELECT s_suppkey, s_name, s_acctbal + 100.0 AS bal
             |  FROM supplier WHERE s_suppkey % 2 = 0)
             |SELECT coalesce(t.s_suppkey, s.s_suppkey) AS s_suppkey,
             |  coalesce(t.s_name, s.s_name) AS s_name,
             |  CASE WHEN s.s_suppkey IS NOT NULL THEN s.bal ELSE t.bal END AS bal,
             |  CASE WHEN s.s_suppkey IS NOT NULL THEN 1 ELSE 0 END AS IsCurrent
             |FROM tgt t FULL OUTER JOIN stg s ON t.s_suppkey = s.s_suppkey
             |ORDER BY s_suppkey""".stripMargin)),

    // A7/J7: two-key MERGE (column-config shape, insert_config.py:301-345).
    "q_merge_2key" -> Q(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val target = li.filter(col("l_orderkey") < 600)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").as("qty"), lit(1).as("IsCurrent"))
        val staging = li.filter(col("l_orderkey") < 800 && col("l_linenumber") <= 3)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_quantity") + 5.0).as("qty"))
        Merge.merge(target, staging, Seq("l_orderkey", "l_linenumber"),
          whenMatchedUpdate = Map("qty" -> src("qty"), "IsCurrent" -> lit(1)),
          insertDefaults = Map("IsCurrent" -> lit(1)),
          whenNotMatchedBySourceSet = Map("IsCurrent" -> lit(0)))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""WITH tgt AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity AS qty, 1 AS IsCurrent
             |  FROM lineitem WHERE l_orderkey < 600),
             |stg AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity + 5.0 AS qty
             |  FROM lineitem WHERE l_orderkey < 800 AND l_linenumber <= 3)
             |SELECT coalesce(t.l_orderkey, s.l_orderkey) AS l_orderkey,
             |  coalesce(t.l_linenumber, s.l_linenumber) AS l_linenumber,
             |  CASE WHEN s.l_orderkey IS NOT NULL THEN s.qty ELSE t.qty END AS qty,
             |  CASE WHEN s.l_orderkey IS NOT NULL THEN 1 ELSE 0 END AS IsCurrent
             |FROM tgt t FULL OUTER JOIN stg s
             |  ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // A7: insert-only MERGE (status seed, insert_config.py:146-161);
    // left-anti + union keeps the target shuffle-free.
    "q_merge_insert_only" -> Q(
      (s, dir) => {
        val seed = s.createDataFrame(Seq(
          (0, "Not Started"), (1, "Completed"), (2, "Cancelled"), (3, "Failed")))
          .toDF("StatusID", "StatusDescription")
        val source = Tables.load(s, dir, "nation")
          .select((col("n_nationkey") % 6).as("StatusID"),
            concat(lit("Status-"), (col("n_nationkey") % 6).cast("string"))
              .as("StatusDescription"))
          .distinct()
        Merge.insertWhenNotMatched(seed, source, Seq("StatusID"))
          .orderBy(col("StatusID"))
      },
      Some("""WITH seed(StatusID, StatusDescription) AS (VALUES
             |  (0,'Not Started'),(1,'Completed'),(2,'Cancelled'),(3,'Failed')),
             |src AS (
             |  SELECT DISTINCT n_nationkey % 6 AS StatusID,
             |    concat('Status-', CAST(n_nationkey % 6 AS VARCHAR)) AS StatusDescription
             |  FROM nation)
             |SELECT * FROM seed
             |UNION ALL
             |SELECT s.* FROM src s
             |WHERE s.StatusID NOT IN (SELECT StatusID FROM seed)
             |ORDER BY StatusID""".stripMargin)),

    // D8: UPDATE … SET … WHERE through the ParquetTable swap kernel
    // (log_table_control_table_upsert.py:71-75 control state machine).
    "q_update_where" -> Q(
      (s, dir) => {
        val ctl = Fixtures.control(s, dir)
        val tmp = Files.createTempDirectory("graft-upd").toString
        val pt = ParquetTable(s, "ctl_upd", s"$tmp/ctl", ctl.schema)
        pt.overwrite(ctl)
        pt.update(col("StatusID") === 3, Map(
          "StatusID" -> lit(0),
          "LastUpdateTime" -> lit(Timestamp.valueOf("2024-01-05 00:00:00"))))
        pt.read().orderBy(col("HeaderID"))
      },
      Some(s"""WITH ctl AS (${Fixtures.controlCte})
              |SELECT HeaderID,
              |  CASE WHEN StatusID = 3 THEN 0 ELSE StatusID END AS StatusID,
              |  JobID,
              |  CASE WHEN StatusID = 3 THEN TIMESTAMP '2024-01-05 00:00:00'
              |       ELSE LastUpdateTime END AS LastUpdateTime
              |FROM ctl ORDER BY HeaderID""".stripMargin)),

    // D9: DELETE FROM … WHERE through the swap kernel
    // (Data Ingestion Helper.py:140 idempotent daily delete).
    "q_delete_where" -> Q(
      (s, dir) => {
        val logs = Fixtures.logs(s, dir)
        val tmp = Files.createTempDirectory("graft-del").toString
        val pt = ParquetTable(s, "logs_del", s"$tmp/logs", logs.schema)
        pt.overwrite(logs)
        pt.deleteWhere(col("LogEntryType") === "INFO")
        pt.read().groupBy(col("LogEntryType"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("LogEntryType"))
      },
      Some(s"""WITH logs AS (${Fixtures.logsCte})
              |SELECT LogEntryType, count(*) AS n FROM logs
              |WHERE NOT (LogEntryType = 'INFO')
              |GROUP BY LogEntryType ORDER BY LogEntryType""".stripMargin)),

    // J2 + nested CASE: the NeedToRun CTE (Run jobs.py:81-132).
    "q_needtorun" -> Q(
      (s, dir) => RunDecision.needToRun(
        Fixtures.control(s, dir), Fixtures.header(s, dir),
        java.sql.Date.valueOf("2024-01-02"))
        .orderBy(col("HeaderID")),
      Some(s"""WITH ctl AS (${Fixtures.controlCte}),
              |hdr AS (${Fixtures.headerCte})
              |SELECT c.HeaderID, c.JobID, h.TableName, h.RunFrequency,
              |  h.Mon, h.Tue, h.Wed, h.Thu, h.Fri, h.Sat, h.Sun, h.SLA
              |FROM ctl c LEFT JOIN hdr h ON c.HeaderID = h.HeaderID
              |WHERE (CASE WHEN CAST(c.LastUpdateTime AS DATE) = DATE '2024-01-02'
              |         AND c.StatusID IN (1,2) THEN 0
              |       ELSE CASE WHEN c.StatusID = 1 THEN 0 ELSE 1 END END) = 1
              |ORDER BY c.HeaderID""".stripMargin)),

    // Run-vs-cancel decision per job (Run jobs.py:150-202) with injected
    // clock: now=14:30 on a Tuesday.
    "q_sla_decision" -> Q(
      (s, dir) => RunDecision.decide(
        RunDecision.needToRun(
          Fixtures.control(s, dir), Fixtures.header(s, dir),
          java.sql.Date.valueOf("2024-01-02")),
        nowTime = "14:30", shortDay = "Tue")
        .orderBy(col("HeaderID")),
      Some(s"""WITH ctl AS (${Fixtures.controlCte}),
              |hdr AS (${Fixtures.headerCte}),
              |ntr AS (
              |  SELECT c.HeaderID, c.JobID, h.TableName, h.RunFrequency,
              |    h.Mon, h.Tue, h.Wed, h.Thu, h.Fri, h.Sat, h.Sun, h.SLA
              |  FROM ctl c LEFT JOIN hdr h ON c.HeaderID = h.HeaderID
              |  WHERE (CASE WHEN CAST(c.LastUpdateTime AS DATE) = DATE '2024-01-02'
              |           AND c.StatusID IN (1,2) THEN 0
              |         ELSE CASE WHEN c.StatusID = 1 THEN 0 ELSE 1 END END) = 1)
              |SELECT *, CASE WHEN '14:30' <= SLA THEN
              |    CASE WHEN RunFrequency = 1 THEN 'run'
              |         WHEN RunFrequency = 2 AND Tue = 1 THEN 'run'
              |         ELSE 'skip' END
              |  ELSE 'cancel' END AS Action
              |FROM ntr ORDER BY HeaderID""".stripMargin)),

    // J1: job-spec synthesis (create_workflow_jobs.py:85-121) — the
    // config triple join with split() email lists, all dims broadcast.
    // The checker's pandas hash only handles scalars, so the entry
    // renders the email array back to a ';'-joined string; the library
    // API (jobSpecs) keeps the typed array.
    "q_job_specs" -> Q(
      (s, dir) => graft.orchestrate.JobPlanner.jobSpecs(
        Fixtures.headerFull(s, dir), Fixtures.jobs(s, dir),
        Fixtures.control(s, dir))
        .withColumn("Emails", array_join(col("Emails"), ";")),
      Some(s"""WITH hdr AS (${Fixtures.headerFullCte}),
              |job AS (${Fixtures.jobsCte}),
              |ctl AS (${Fixtures.controlCte})
              |SELECT h.HeaderID, c.JobID,
              |  concat(trim(h.TargetTableSchema), '.', trim(h.TargetTableName)) AS TableName,
              |  array_to_string(string_split(j.Emails, ','), ';') AS Emails,
              |  j.CronSyntax, j.WarningDuration, j.TimeOut, j.Retries,
              |  j.ClusterMaxWorkers, h.ContinuousRunFlag
              |FROM hdr h
              |JOIN job j ON h.HeaderID = j.HeaderID
              |JOIN ctl c ON h.HeaderID = c.HeaderID
              |WHERE h.IsCurrent = 1
              |ORDER BY h.HeaderID""".stripMargin)),

    // J4 + F-concat/substring/CASE: the report's config view — source
    // path synthesis with a date-partition suffix
    // (Autoloader_daily_log_report.sql:24-52), clock injected.
    "q_report_config" -> Q(
      (s, dir) => {
        val d = "2024-01-15"
        Fixtures.headerFull(s, dir).join(
          broadcast(Fixtures.jobs(s, dir)), Seq("HeaderID"))
          .select(col("HeaderID"),
            concat(lit("/raw/"),
              when(col("SourceFilePath").like("%current%"), col("SourceFilePath"))
                .otherwise(concat(col("SourceFilePath"),
                  substring(lit(d), 1, 4), lit("/"),
                  substring(lit(d), 6, 2), lit("/"),
                  substring(lit(d), 9, 2))),
              lit("/*.parquet")).as("FilePath"),
            concat(trim(col("TargetTableSchema")), lit("."),
              trim(col("TargetTableName"))).as("TargetName"),
            col("WarningDuration"))
          .orderBy(col("HeaderID"))
      },
      Some(s"""WITH hdr AS (${Fixtures.headerFullCte}),
              |job AS (${Fixtures.jobsCte})
              |SELECT h.HeaderID,
              |  concat('/raw/',
              |    CASE WHEN h.SourceFilePath LIKE '%current%' THEN h.SourceFilePath
              |         ELSE concat(h.SourceFilePath,
              |           substring('2024-01-15', 1, 4), '/',
              |           substring('2024-01-15', 6, 2), '/',
              |           substring('2024-01-15', 9, 2)) END,
              |    '/*.parquet') AS FilePath,
              |  concat(trim(h.TargetTableSchema), '.', trim(h.TargetTableName)) AS TargetName,
              |  j.WarningDuration
              |FROM hdr h JOIN job j ON h.HeaderID = j.HeaderID
              |ORDER BY h.HeaderID""".stripMargin)),

    // J3: pending-job SLA sweep (Run jobs.py:180-202).
    "q_sla_cancel" -> Q(
      (s, dir) => RunDecision.slaCancel(
        Fixtures.control(s, dir), Fixtures.header(s, dir), nowTime = "09:00")
        .orderBy(col("HeaderID")),
      Some(s"""WITH ctl AS (${Fixtures.controlCte}),
              |hdr AS (${Fixtures.headerCte})
              |SELECT c.HeaderID, c.JobID, h.SLA, h.TableName
              |FROM ctl c LEFT JOIN hdr h ON c.HeaderID = h.HeaderID
              |WHERE c.StatusID = 1 AND '09:00' > h.SLA
              |ORDER BY c.HeaderID""".stripMargin)),

    // SCD Type-2 dimension maintenance (graft.catalog.Scd2): a change
    // batch against a versioned customer dimension — changed keys close
    // out and reopen at asOf, no-op changes pass through, brand-new
    // keys insert, pre-existing history is untouched. The change-side
    // joins all broadcast; the dimension is never shuffled.
    "q_scd2" -> Q(
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
        val dim = cust.select(col("c_custkey").as("k"),
          col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"),
          lit(Timestamp.valueOf("2024-01-01 00:00:00")).as("eff_from"),
          lit(null).cast("timestamp").as("eff_to"), lit(1).as("is_current"))
          .unionByName(cust.filter(col("c_custkey") < 10)
            .select(col("c_custkey").as("k"), lit("OLD").as("seg"),
              col("c_acctbal").as("bal"),
              lit(Timestamp.valueOf("2023-01-01 00:00:00")).as("eff_from"),
              lit(Timestamp.valueOf("2024-01-01 00:00:00")).cast("timestamp")
                .as("eff_to"),
              lit(0).as("is_current")))
        val changes = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
            (col("c_acctbal") + 100.0).as("bal"))
          .unionByName(cust.filter(col("c_custkey") % 7 === 1)
            .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
              col("c_acctbal").as("bal"))) // no-op rows
          .unionByName(cust.filter(col("c_custkey") < 5)
            .select((col("c_custkey") + 1000000L).as("k"),
              lit("NEW").as("seg"), lit(0.0).as("bal")))
        graft.catalog.Scd2.applyChanges(dim, changes, Seq("k"),
          Seq("seg", "bal"),
          asOf = lit(Timestamp.valueOf("2024-06-01 00:00:00")))
          .orderBy(col("k"), col("eff_from"), col("is_current"))
      },
      Some("""WITH dim AS (
             |  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
             |    TIMESTAMP '2024-01-01' AS eff_from,
             |    CAST(NULL AS TIMESTAMP) AS eff_to, 1 AS is_current
             |  FROM customer
             |  UNION ALL
             |  SELECT c_custkey, 'OLD', c_acctbal,
             |    TIMESTAMP '2023-01-01', TIMESTAMP '2024-01-01', 0
             |  FROM customer WHERE c_custkey < 10),
             |changes AS (
             |  SELECT c_custkey AS k, c_mktsegment AS seg,
             |    c_acctbal + 100.0 AS bal
             |  FROM customer WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT c_custkey, c_mktsegment, c_acctbal
             |  FROM customer WHERE c_custkey % 7 = 1
             |  UNION ALL
             |  SELECT c_custkey + 1000000, 'NEW', 0.0
             |  FROM customer WHERE c_custkey < 5),
             |cur AS (SELECT * FROM dim WHERE is_current = 1),
             |hist AS (SELECT * FROM dim WHERE is_current <> 1),
             |j AS (
             |  SELECT c.k, c.seg, c.bal, c.eff_from, c.eff_to, c.is_current,
             |    ch.k AS sk, ch.seg AS sseg, ch.bal AS sbal
             |  FROM cur c LEFT JOIN changes ch ON c.k = ch.k),
             |cls AS (
             |  SELECT *, (sk IS NOT NULL AND NOT
             |    (seg IS NOT DISTINCT FROM sseg AND
             |     bal IS NOT DISTINCT FROM sbal)) AS changed
             |  FROM j)
             |SELECT k, seg, bal, eff_from, eff_to, is_current FROM hist
             |UNION ALL
             |SELECT k, seg, bal, eff_from,
             |  CASE WHEN changed THEN TIMESTAMP '2024-06-01' ELSE eff_to END,
             |  CASE WHEN changed THEN 0 ELSE is_current END
             |FROM cls
             |UNION ALL
             |SELECT k, sseg, sbal, TIMESTAMP '2024-06-01',
             |  CAST(NULL AS TIMESTAMP), 1
             |FROM cls WHERE changed
             |UNION ALL
             |SELECT ch.k, ch.seg, ch.bal, TIMESTAMP '2024-06-01',
             |  CAST(NULL AS TIMESTAMP), 1
             |FROM changes ch LEFT JOIN cur c ON ch.k = c.k
             |WHERE c.k IS NULL
             |ORDER BY k, eff_from, is_current""".stripMargin)),

    // Dataset-snapshot diff — the version-compare a training-data ops
    // flow runs between two corpus releases before promoting one:
    // classify every key as added / removed / changed / unchanged and
    // report the per-class tally with its id range. Fixture: v2
    // derives from `documents` by dropping doc_id % 17 = 3, appending
    // a revision marker to text for doc_id % 13 = 5, and inserting
    // doc_id + 1000000 rows for doc_id % 29 = 0 — all four classes
    // populated deterministically. Rows compare by md5 FINGERPRINT,
    // not text equality, so the join carries (key, 32-byte fp), never
    // two copies of the payload — the shape that matters at 100 TB:
    // one full-outer equi-join on the key, map-side fingerprinting,
    // and a 4-row bounded aggregate out. (SCD2 above is the
    // slowly-changing HISTORY maintenance; this is the stateless
    // two-snapshot compare.)
    "q_snapshot_diff" -> Q(
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val v1 = docs.select(col("doc_id"), md5(col("text")).as("fp1"))
        val v2 = docs.filter(pmod(col("doc_id"), lit(17L)) =!= 3L)
          .select(col("doc_id"),
            md5(when(pmod(col("doc_id"), lit(13L)) === 5L,
              concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text"))).as("fp2"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(29L)) === 0L)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              md5(concat(lit("added document "), col("doc_id"))).as("fp2")))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("fp1").isNull, "added")
              .when(col("fp2").isNull, "removed")
              .when(col("fp1") =!= col("fp2"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("status"))
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, md5(text) AS fp1 FROM documents),
             |v2 AS (
             |  SELECT doc_id,
             |    md5(CASE WHEN doc_id % 13 = 5 THEN text || ' [rev2]'
             |             ELSE text END) AS fp2
             |  FROM documents WHERE doc_id % 17 <> 3
             |  UNION ALL
             |  SELECT doc_id + 1000000 AS doc_id,
             |    md5('added document ' || doc_id) AS fp2
             |  FROM documents WHERE doc_id % 29 = 0),
             |d AS (
             |  SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             |    CASE WHEN fp1 IS NULL THEN 'added'
             |         WHEN fp2 IS NULL THEN 'removed'
             |         WHEN fp1 <> fp2 THEN 'changed'
             |         ELSE 'unchanged' END AS status
             |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
             |SELECT status, CAST(count(*) AS BIGINT) AS n,
             |  min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM d GROUP BY status ORDER BY status""".stripMargin))
  )
}
