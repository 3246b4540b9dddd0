package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Throwaway gap-hunt round 3 (r18 verdict #6): run ~50 common Neo4j
  * idioms, report pass/fail each. Never asserts — read the output,
  * close the real misses, then delete or convert to real specs. */
class GapHunt3Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("hunt") {
    val s = new GraftSession(spark)
    s.cypher("CREATE (:GH {k: 1, name: 'alpha'})-[:GR {w: 2}]->(:GH {k: 2, name: 'beta'})")
    val probes: Seq[(String, String)] = Seq(
      // temporal component maps + accessors
      "datetime epochMillis" -> "RETURN datetime({epochMillis: 86400000}) AS v",
      "datetime epochSeconds" -> "RETURN datetime({epochSeconds: 86400}) AS v",
      "datetime components" -> "RETURN datetime({year: 2020, month: 3, day: 4, hour: 5, minute: 6, second: 7}) AS v",
      "date components" -> "RETURN date({year: 2020, month: 3, day: 4}) AS v",
      "localdatetime components" -> "RETURN localdatetime({year: 2020, month: 3, day: 4, hour: 5}) AS v",
      "datetime timezone arg" -> "RETURN datetime({year: 2020, month: 1, day: 1, timezone: 'UTC'}) AS v",
      "date accessor .year" -> "RETURN date('2020-03-04').year AS y, date('2020-03-04').month AS m, date('2020-03-04').day AS d",
      "datetime accessor .hour" -> "RETURN datetime('2020-03-04T05:06:07Z').hour AS h",
      "datetime .epochMillis" -> "RETURN datetime('1970-01-02T00:00:00Z').epochMillis AS v",
      "datetime .dayOfWeek" -> "RETURN date('2024-01-01').dayOfWeek AS v",
      "datetime .week" -> "RETURN date('2024-01-04').week AS v",
      "datetime .quarter" -> "RETURN date('2024-05-04').quarter AS v",
      "duration accessor .days" -> "RETURN duration('P3D').days AS v",
      "timestamp()" -> "RETURN timestamp() AS v",
      // scalar or-null casts
      "toIntegerOrNull" -> "RETURN toIntegerOrNull('x') AS a, toIntegerOrNull('3') AS b",
      "toFloatOrNull" -> "RETURN toFloatOrNull('x') AS a, toFloatOrNull('3.5') AS b",
      "toBooleanOrNull" -> "RETURN toBooleanOrNull('x') AS a, toBooleanOrNull('true') AS b",
      "toBoolean" -> "RETURN toBoolean('true') AS v",
      // string fns
      "left/right" -> "RETURN left('hello', 2) AS l, right('hello', 2) AS r",
      "ltrim char arg" -> "RETURN ltrim('xxhixx', 'x') AS v",
      "btrim" -> "RETURN btrim('xxhixx', 'x') AS v",
      "normalize" -> "RETURN normalize('á') AS v",
      "round precision" -> "RETURN round(3.14159, 2) AS v",
      "round mode" -> "RETURN round(2.5, 0, 'HALF_DOWN') AS v",
      "isNaN" -> "RETURN isNaN(0.0/0.0) AS v",
      "e and pi" -> "RETURN e() AS e, pi() AS p",
      // aggregates
      "percentileCont" -> "UNWIND [1,2,3,4] AS x RETURN percentileCont(x, 0.5) AS v",
      "percentileDisc" -> "UNWIND [1,2,3,4] AS x RETURN percentileDisc(x, 0.5) AS v",
      "stDev" -> "UNWIND [1,2,3,4] AS x RETURN stDev(x) AS v",
      "stDevP" -> "UNWIND [1,2,3,4] AS x RETURN stDevP(x) AS v",
      // apoc.map.*
      "apoc.map.fromPairs" -> "RETURN apoc.map.fromPairs([['a', 1], ['b', 2]]) AS v",
      "apoc.map.merge" -> "RETURN apoc.map.merge({a: 1}, {b: 2}) AS v",
      "apoc.map.setKey" -> "RETURN apoc.map.setKey({a: 1}, 'b', 2) AS v",
      "apoc.map.removeKey" -> "RETURN apoc.map.removeKey({a: 1, b: 2}, 'b') AS v",
      "apoc.map.get" -> "RETURN apoc.map.get({a: 1}, 'a', -1) AS v",
      "apoc.map.fromLists" -> "RETURN apoc.map.fromLists(['a','b'], [1,2]) AS v",
      // apoc.agg.*
      "apoc.agg.first" -> "UNWIND [3,1,2] AS x RETURN apoc.agg.first(x) AS v",
      "apoc.agg.last" -> "UNWIND [3,1,2] AS x RETURN apoc.agg.last(x) AS v",
      "apoc.agg.median" -> "UNWIND [1,2,3,4] AS x RETURN apoc.agg.median(x) AS v",
      "apoc.agg.statistics" -> "UNWIND [1,2,3] AS x RETURN apoc.agg.statistics(x) AS v",
      // apoc misc
      "apoc.util.md5" -> "RETURN apoc.util.md5(['a']) AS v",
      "apoc.util.sha1" -> "RETURN apoc.util.sha1(['a']) AS v",
      "apoc.text.distance" -> "RETURN apoc.text.distance('kitten', 'sitting') AS v",
      "apoc.text.clean" -> "RETURN apoc.text.clean('Hello, World!') AS v",
      "apoc.date.format" -> "RETURN apoc.date.format(86400000, 'ms', 'yyyy-MM-dd') AS v",
      "apoc.date.parse" -> "RETURN apoc.date.parse('1970-01-02', 'ms', 'yyyy-MM-dd') AS v",
      // SHOW edge cases
      "SHOW DATABASES yield where" -> "SHOW DATABASES YIELD name WHERE name = 'neo4j' RETURN name",
      "SHOW DEFAULT DATABASE" -> "SHOW DEFAULT DATABASE",
      "SHOW SETTINGS named" -> "SHOW SETTINGS 'server.bolt.enabled'",
      "SHOW INDEXES yield star" -> "SHOW INDEXES YIELD *",
      "SHOW CONSTRAINTS where type" -> "SHOW CONSTRAINTS YIELD name, type WHERE type = 'UNIQUENESS' RETURN name",
      // EXPLAIN / PROFILE
      "EXPLAIN prefix" -> "EXPLAIN MATCH (n:GH) RETURN n.k",
      "PROFILE prefix" -> "PROFILE MATCH (n:GH) RETURN n.k AS k",
      // misc expression surface
      "CASE value match" -> "RETURN CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END AS v",
      "range step" -> "RETURN range(0, 10, 5) AS v",
      "list head/tail/last" -> "RETURN head([1,2,3]) AS h, tail([1,2,3]) AS t, last([1,2,3]) AS l",
      "keys of node" -> "MATCH (n:GH {k: 1}) RETURN keys(n) AS v",
      "properties of node" -> "MATCH (n:GH {k: 1}) RETURN properties(n) AS v",
      "randomUUID" -> "RETURN randomUUID() AS v",
      "valueType" -> "RETURN valueType(1) AS v",
      "char_length" -> "RETURN char_length('abc') AS v",
      "point refuses or works" -> "RETURN point({x: 1.0, y: 2.0}) AS v",
      "elementId" -> "MATCH (n:GH {k: 1}) RETURN elementId(n) AS v",
      "db.info" -> "CALL db.info() YIELD name RETURN name",
      "dbms.components" -> "CALL dbms.components() YIELD name, versions RETURN name"
    )
    val results = probes.map { case (name, q) =>
      try {
        val df = s.cypher(q)
        val n = df.collect().length
        (name, s"OK rows=$n")
      } catch {
        case e: Throwable =>
          (name, s"FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(110).replace('\n', ' ')}")
      }
    }
    results.foreach { case (n, r) => info(f"$n%-28s $r") }
  }
}
