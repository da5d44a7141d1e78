package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** S1 live evidence: the JDBC chunked/partitioned JSON-column scan
  * (`Sources.jdbcJson`, the `load_knowledge_graph.py:60-79` equivalent)
  * against a real database — embedded Derby, the one JDBC engine on the
  * provided Spark classpath. Covers what the Postgres config can't be
  * tested for in this sandbox: a real driver handshake, a real
  * partitioned range scan (4 concurrent connections), and the
  * flatten-to-quads composition on rows that came through JDBC.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dbDir = s"${System.getProperty("java.io.tmpdir")}/graft-derby-${System.nanoTime()}"
  private val url = s"jdbc:derby:$dbDir;create=true"
  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def seed(): Unit = {
    // derby.log lands in derby.system.home, not the repo cwd
    System.setProperty("derby.system.home", s"$dbDir-home")
    Class.forName(Driver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE docs (id INT PRIMARY KEY, payload VARCHAR(4000))")
      val ins = conn.prepareStatement("INSERT INTO docs VALUES (?, ?)")
      (0 until 20).foreach { i =>
        ins.setInt(1, i)
        ins.setString(2, s"""{"Name": "Tenant $i", "ExternalId": "OR-$i"}""")
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("partitioned JDBC scan reads every row through 4 range partitions") {
    seed()
    val df = Sources.jdbcJson(spark, url, "docs", "payload",
      fetchSize = 5,
      partitionOptions = Map(
        "partitionColumn" -> "id", "lowerBound" -> "0",
        "upperBound" -> "20", "numPartitions" -> "4"),
      connectionProperties = Map("driver" -> Driver))
    // the range split must actually happen: 4 JDBC partitions, each a
    // separate connection+cursor at runtime
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 20)
    assert(df.select("json").collect().map(_.getString(0)).sorted.head
      == """{"Name": "Tenant 0", "ExternalId": "OR-0"}""")
  }

  test("the 4 partitions carry 4 range WHERE clauses; predicates push to JDBC") {
    import org.apache.spark.sql.functions.col
    val df = Sources.jdbcJson(spark, url, "docs", "payload",
      fetchSize = 5,
      partitionOptions = Map(
        "partitionColumn" -> "id", "lowerBound" -> "0",
        "upperBound" -> "20", "numPartitions" -> "4"),
      connectionProperties = Map("driver" -> Driver),
      keepColumns = Seq("id"))
    // (a) each runtime partition is a separate range query: the
    // JDBCPartition's whereClause is appended verbatim to that
    // partition's SELECT (reflected — the class is spark-private)
    val clauses = df.rdd.partitions.map { p =>
      p.getClass.getMethod("whereClause").invoke(p).asInstanceOf[String]
    }
    assert(clauses.length == 4, clauses.mkString("; "))
    // stride (20-0)/4 = 5: three upper bounds and one unbounded tail,
    // every inner partition bounded on both sides
    assert(clauses.count(_.contains("< 5")) == 1, clauses.mkString("; "))
    assert(clauses.count(c => c.contains(">= 5") && c.contains("< 10")) == 1)
    assert(clauses.count(c => c.contains(">= 10") && c.contains("< 15")) == 1)
    assert(clauses.count(c => c.contains(">= 15") && !c.contains("<")) == 1)
    // (b) a filter on a kept source column is pushed INTO the JDBC scan
    // (the database evaluates it), not applied Spark-side after the read
    val filtered = df.where(col("id") >= 10)
    assert(filtered.count() == 10)
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters:") &&
      "(?i)GreaterThanOrEqual\\(id,10\\)".r.findFirstIn(plan).isDefined,
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("jdbcJsonToQuads composes the live scan with the flattener") {
    val quads = Sources.jdbcJsonToQuads(spark, url, "docs", "payload",
      graph = "http://g/jdbc", namespace = "http://localhost/",
      partitionOptions = Map(
        "partitionColumn" -> "id", "lowerBound" -> "0",
        "upperBound" -> "20", "numPartitions" -> "4",
        "driver" -> Driver))
    val rows = quads.toDF().collect()
    assert(rows.length == 40) // 20 docs x {Name, ExternalId}
    assert(rows.forall(_.getString(0) == "http://g/jdbc"))
    val names = rows.filter(_.getString(2) == "http://localhost/Name")
    assert(names.length == 20)
    assert(names.map(_.getString(3)).toSet == (0 until 20).map(i => s"Tenant $i").toSet)
  }
}
