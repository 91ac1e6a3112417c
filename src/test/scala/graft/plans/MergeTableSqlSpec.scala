package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.layout.MergeTable

/** The SQL front door for ⊕K7: verbatim `MERGE INTO` / `VERSION AS OF` /
  * plain SELECT over [[MergeTableSql]]-registered MergeTable names,
  * resolved by the extension-injected [[MergeTableSqlResolution]] rule
  * (SparkSpec's session carries `spark.sql.extensions=graft.GraftExtensions`,
  * the same config every engine entry point sets). */
class MergeTableSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): (String, String) = {
    val name = s"mt_$tag"
    val dir = Files.createTempDirectory(s"sqlmerge_$tag").toString + "/t"
    MergeTableSql.register(name, dir, numBuckets = 4)
    (name, dir)
  }

  private def state(dir: String): Seq[(Long, Double, String)] =
    MergeTable.read(spark, dir)
      .select(col("k"), col("price"), col("status"))
      .as[(Long, Double, String)].collect().toSeq.sortBy(_._1)

  test("MERGE INTO creates the table (INSERT *), then update/delete/insert in one statement") {
    val (name, dir) = freshTable("full")
    Seq((1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 30.0, "A"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_base")
    // first MERGE creates the table
    val v0 = spark.sql(
      s"""MERGE INTO $name t USING src_base s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .collect().head.getLong(0)
    assert(v0 === 0L)
    assert(state(dir) === Seq((1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 30.0, "A")))
    // mixed batch: update k=1, delete k=2, insert k=4 — conditions across
    // clauses, evaluated per ANSI first-applicable order
    Seq((1L, 11.0, "U"), (2L, 0.0, "X"), (4L, 40.0, "N"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_delta")
    val v1 = spark.sql(
      s"""MERGE INTO $name t USING src_delta s ON t.k = s.k
         |WHEN MATCHED AND s.status = 'X' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED AND s.status <> 'X' THEN INSERT *""".stripMargin)
      .collect().head.getLong(0)
    assert(v1 === 1L)
    assert(state(dir) === Seq((1L, 11.0, "U"), (3L, 30.0, "A"), (4L, 40.0, "N")))
  }

  test("MERGE assignments: SET with expressions over both sides, INSERT (cols) VALUES") {
    val (name, dir) = freshTable("assign")
    Seq((1L, 10.0, "A"), (2L, 20.0, "A"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_a0")
    spark.sql(s"""MERGE INTO $name t USING src_a0 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    Seq((1L, 5.0, "u"), (9L, 90.0, "n"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_a1")
    spark.sql(
      s"""MERGE INTO $name t USING src_a1 s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET price = t.price + s.price
         |WHEN NOT MATCHED THEN INSERT (k, price) VALUES (s.k, s.price * 2)""".stripMargin)
      .collect()
    // updated row keeps unassigned status; inserted row nulls it
    assert(MergeTable.read(spark, dir)
      .select(col("k"), col("price"), col("status"))
      .as[(Long, Double, Option[String])].collect().toSeq.sortBy(_._1) ===
      Seq((1L, 15.0, Some("A")), (2L, 20.0, Some("A")), (9L, 180.0, None)))
  }

  test("WHEN MATCHED AND condition referencing the TARGET gates the update (stale-update drop)") {
    val (name, dir) = freshTable("cond")
    Seq((1L, 10.0, "A"), (2L, 20.0, "A"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_c0")
    spark.sql(s"""MERGE INTO $name t USING src_c0 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // only rows where the source price BEATS the target commit
    Seq((1L, 5.0, "low"), (2L, 25.0, "hi"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_c1")
    spark.sql(
      s"""MERGE INTO $name t USING src_c1 s ON t.k = s.k
         |WHEN MATCHED AND s.price > t.price THEN UPDATE SET *""".stripMargin)
      .collect()
    assert(state(dir) === Seq((1L, 10.0, "A"), (2L, 25.0, "hi")))
  }

  test("WHEN NOT MATCHED BY SOURCE THEN DELETE removes target rows absent from the source") {
    val (name, dir) = freshTable("nmbs")
    Seq((1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 30.0, "A"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_n0")
    spark.sql(s"""MERGE INTO $name t USING src_n0 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    Seq((2L, 21.0, "B")).toDF("k", "price", "status")
      .createOrReplaceTempView("src_n1")
    spark.sql(
      s"""MERGE INTO $name t USING src_n1 s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect()
    assert(state(dir) === Seq((2L, 21.0, "B")))
  }

  test("VERSION AS OF and plain SELECT resolve through SQL; version pins each snapshot") {
    val (name, dir) = freshTable("tt")
    Seq((1L, 10.0, "A")).toDF("k", "price", "status")
      .createOrReplaceTempView("src_t0")
    spark.sql(s"""MERGE INTO $name t USING src_t0 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    Seq((1L, 99.0, "Z")).toDF("k", "price", "status")
      .createOrReplaceTempView("src_t1")
    spark.sql(s"""MERGE INTO $name t USING src_t1 s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(spark.sql(s"SELECT price FROM $name VERSION AS OF 0")
      .as[Double].collect().toSeq === Seq(10.0))
    assert(spark.sql(s"SELECT price FROM $name").as[Double].collect().toSeq
      === Seq(99.0))
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $name v WHERE v.status = 'Z'")
      .as[Long].head() === 1L)
    // dir sanity: both versions listable through the Scala API too
    assert(MergeTable.versions(dir) === Seq(0L, 1L))
  }

  test("WHERE shapes the pruning hint can't analyze (subqueries, alias-qualified refs) still answer exactly") {
    val (name, dir) = freshTable("whshapes")
    Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "A"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_w0")
    spark.sql(s"""MERGE INTO $name t USING src_w0 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // scalar subquery in the WHERE: the driver-side mini-analysis cannot
    // resolve it → no pruner engages, the analyzer's Filter still answers
    assert(spark.sql(
      s"SELECT k FROM $name WHERE price > (SELECT avg(price) FROM $name)")
      .as[Long].collect().toSeq.sorted === Seq(3L))
    // alias-qualified reference: unqualified for the hint, answer exact
    assert(spark.sql(
      s"SELECT x.k FROM $name AS x WHERE x.price >= 20.0 ORDER BY x.k")
      .as[Long].collect().toSeq === Seq(2L, 3L))
    // table-name-qualified reference
    assert(spark.sql(
      s"SELECT $name.k FROM $name WHERE $name.status = 'A' ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 3L))
  }

  test("SQL MERGE is serializable: a commit landing between classification and merge conflicts loudly") {
    val (name, dir) = freshTable("serial")
    Seq((1L, 10.0, "A")).toDF("k", "price", "status")
      .createOrReplaceTempView("src_s0")
    spark.sql(s"""MERGE INTO $name t USING src_s0 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // simulate the interleaving at the API layer: classification read at
    // version 0, another writer commits version 1, then the stale merge
    val stale = MergeTable.read(spark, dir)
      .withColumn("op_flag", lit("update"))
    graft.layout.MergeTable.merge(spark, dir,
      Seq((7L, 70.0, "C", "create")).toDF("k", "price", "status", "op_flag"),
      "k") // the interloper: now at version 1
    intercept[MergeTable.ConflictException] {
      MergeTable.merge(spark, dir, stale, "k",
        expectedParent = Some(Some(0L))) // classified at v0 — must conflict
    }
    // un-fenced merges keep last-write-wins (explicit-op callers)
    assert(MergeTable.currentVersion(dir) === Some(1L))
  }

  test("MERGE WITH SCHEMA EVOLUTION carries new source columns; plain MERGE keeps the target schema") {
    val (name, dir) = freshTable("evo")
    Seq((1L, 10.0, "A")).toDF("k", "price", "status")
      .createOrReplaceTempView("src_e0")
    spark.sql(s"""MERGE INTO $name t USING src_e0 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // source grows a column; WITH SCHEMA EVOLUTION widens the table
    Seq((1L, 11.0, "B", "x1"), (2L, 20.0, "C", "x2"))
      .toDF("k", "price", "status", "tag").createOrReplaceTempView("src_e1")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name t USING src_e1 s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(MergeTable.read(spark, dir).columns.toSeq ===
      Seq("k", "price", "status", "tag"))
    assert(MergeTable.read(spark, dir).select("k", "tag")
      .as[(Long, String)].collect().toSet === Set(1L -> "x1", 2L -> "x2"))
    // plain MERGE with a source carrying a column the TARGET lacks: the
    // undeclared column is ignored (no silent evolution); matching
    // columns (tag) still flow through INSERT *
    Seq((3L, 30.0, "D", "x3", "zz"))
      .toDF("k", "price", "status", "tag", "extra")
      .createOrReplaceTempView("src_e2")
    spark.sql(s"""MERGE INTO $name t USING src_e2 s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(MergeTable.read(spark, dir).columns.toSeq ===
      Seq("k", "price", "status", "tag"),
      "plain MERGE must not evolve the schema")
    assert(MergeTable.read(spark, dir).filter(col("k") === 3L)
      .select("tag").as[String].head() === "x3")
  }

  test("ALTER TABLE DROP/RENAME/ALTER COLUMN resolve to the metadata-only evolution commits") {
    val (name, dir) = freshTable("alter")
    Seq((1L, 10, "A"), (2L, 20, "B")).toDF("k", "n", "status")
      .select(col("k"), col("n").cast("int"), col("status"))
      .createOrReplaceTempView("src_alter")
    spark.sql(s"""MERGE INTO $name t USING src_alter s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val before = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    spark.sql(s"ALTER TABLE $name DROP COLUMN status").collect()
    assert(MergeTable.read(spark, dir).columns.toSeq === Seq("k", "n"))
    spark.sql(s"ALTER TABLE $name RENAME COLUMN n TO amount").collect()
    assert(MergeTable.read(spark, dir).columns.toSeq === Seq("k", "amount"))
    val v = spark.sql(s"ALTER TABLE $name ALTER COLUMN amount TYPE decimal(20,4)")
      .collect().head.getLong(0)
    assert(v === 3L)
    assert(MergeTable.read(spark, dir).schema("amount").dataType ===
      org.apache.spark.sql.types.DecimalType(20, 4))
    // decimal widen is one of the shapes the parquet reader itself cannot
    // do — values must still read exactly, cast in the plan
    assert(spark.sql(s"SELECT CAST(amount AS STRING) AS a FROM $name WHERE k = 2")
      .as[String].head() === "20.0000")
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(after === before, "three ALTERs must move no data")
    // narrowing through SQL is rejected by the same upcast gate
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $name ALTER COLUMN amount TYPE int").collect()
    }
    // DROP COLUMN IF EXISTS on a missing column is a no-op, not an error
    spark.sql(s"ALTER TABLE $name DROP COLUMN IF EXISTS ghost").collect()
    assert(MergeTable.read(spark, dir).columns.toSeq === Seq("k", "amount"))
  }

  test("DELETE FROM and UPDATE resolve through SQL: snapshot-classified, bucket-pruned, key-protected") {
    val (name, dir) = freshTable("dml")
    Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "price", "status").createOrReplaceTempView("src_dml")
    spark.sql(s"""MERGE INTO $name t USING src_dml s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    // UPDATE with an expression over the current row, WHERE filtered
    val v1 = spark.sql(
      s"UPDATE $name SET price = price * 2, status = 'X' WHERE k <= 2")
      .collect().head.getLong(0)
    assert(v1 === 1L)
    assert(state(dir) === Seq((1L, 20.0, "X"), (2L, 40.0, "X"), (3L, 30.0, "C")))
    // DELETE WHERE
    spark.sql(s"DELETE FROM $name WHERE status = 'X' AND price > 30.0").collect()
    assert(state(dir) === Seq((1L, 20.0, "X"), (3L, 30.0, "C")))
    // unconditional DELETE empties the table
    spark.sql(s"DELETE FROM $name").collect()
    assert(MergeTable.read(spark, dir).count() === 0L)
    // the key column cannot be assigned
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $name SET k = 99").collect()
    }
    assert(e.getMessage.contains("key column"))
  }

  test("DESCRIBE TABLE lists the current logical schema with key and version") {
    val (name, _) = freshTable("desc")
    Seq((1L, 10.0, "A")).toDF("k", "price", "status")
      .createOrReplaceTempView("src_desc")
    spark.sql(s"""MERGE INTO $name t USING src_desc s ON t.k = s.k
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    spark.sql(s"ALTER TABLE $name RENAME COLUMN price TO amount").collect()
    val rows = spark.sql(s"DESCRIBE TABLE $name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.map(_._1).toSeq === Seq("k", "amount", "status"))
    assert(rows.head._3.startsWith("key; "))
    assert(rows.head._3.contains("v1"), s"version in comment: ${rows.head._3}")
    assert(rows(1)._2 === "double")
  }

  test("temp views shadow registered names: registration never hijacks an existing relation") {
    val (name, _) = freshTable("shadow")
    Seq((42L, 1.0, "V")).toDF("k", "price", "status")
      .createOrReplaceTempView(name)
    try {
      // the temp view resolves FIRST (built-in rules run before injected
      // ones): SELECT sees the view, not the merge table
      assert(spark.sql(s"SELECT k FROM $name").as[Long].head() === 42L)
    } finally spark.catalog.dropTempView(name)
  }
}
