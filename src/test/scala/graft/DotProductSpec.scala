package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Native codegen'd DotProduct vs the pure-built-ins HOF formulation:
  * bit-identical results (same IEEE left-to-right order) on real fixture
  * embeddings and edge cases. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot == HOF dot bitwise on fixture embeddings") {
    val e = Tables.embeddings(spark, sf001).limit(200)
    val pairs = e.toDF("ida", "va", "la")
      .crossJoin(e.toDF("idb", "vb", "lb")).limit(5000)
    val diff = pairs.select(
      VectorFunctions.dot(col("va"), col("vb")).as("native"),
      VectorFunctions.dotHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")) // bitwise: any ulp diff fails
      .count()
    assert(diff == 0L)
  }

  test("dot edge cases: empty arrays, nulls propagate") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])),
      (None, Some(Seq(1.0))))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).getDouble(0) == 0.0)
    assert(got(2).isNullAt(0))
  }

  test("dot matches the HOF idiom on length mismatch and null elements") {
    // zip_with pads the shorter array with nulls and a null element poisons
    // the fold — DotProduct must agree (it's substituted for the HOF by
    // RewriteHofDotProduct session-wide, so divergence = wrong answers)
    val df = Seq(
      (Seq(Some(1.0), Some(2.0), Some(3.0)), Seq(Some(4.0), Some(5.0))),
      (Seq(Some(1.0), None), Seq(Some(3.0), Some(4.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0), Some(4.0))))
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      VectorFunctions.dotHof(col("a"), col("b")).as("hof")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1)) // length mismatch
    assert(got(1).isNullAt(0) && got(1).isNullAt(1)) // null element
    assert(got(2).getDouble(0) == 11.0 && got(2).getDouble(1) == 11.0)
  }

  test("codegen path actually engages (no fallback in explain)") {
    val e = Tables.embeddings(spark, sf0001)
    val plan = e.select(VectorFunctions.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // `*(n)` prefix = inside a WholeStageCodegen stage; a codegen fallback
    // would print a bare `Project [graft_dot(...)]`
    assert(plan.contains("*(1) Project [graft_dot"), plan.take(500))
  }

  test("fused cosine == composed three-pass cosine bitwise on fixture embeddings") {
    val e = Tables.embeddings(spark, sf001).limit(200)
    val pairs = e.toDF("ida", "va", "la")
      .crossJoin(e.toDF("idb", "vb", "lb")).limit(5000)
    val diff = pairs.select(
      VectorFunctions.cosine(col("va"), col("vb")).as("fused"),
      VectorFunctions.cosineComposed(col("va"), col("vb")).as("composed"))
      .filter(col("fused") =!= col("composed")) // bitwise: any ulp diff fails
      .count()
    assert(diff == 0L)
  }

  test("fused cosine edge cases: nulls and mismatch match composed; zero norm -> NULL not ANSI throw") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (Some(Seq(1.0)), Some(Seq(1.0, 2.0))), // length mismatch -> null
      (None, Some(Seq(1.0))))                // null input -> null
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("f"),
      VectorFunctions.cosineComposed(col("a"), col("b")).as("c")).collect()
    assert(got(0).getDouble(0) == got(0).getDouble(1))
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    assert(got(2).isNullAt(0) && got(2).isNullAt(1))
    // zero-norm: the composed Column `/` throws DIVIDE_BY_ZERO under
    // ANSI; the fused expression must yield NULL instead (a degenerate
    // row must not kill the job)
    val zero = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val fused = zero.select(VectorFunctions.cosine(col("a"), col("b")))
      .collect()
    assert(fused(0).isNullAt(0))
    intercept[Exception] {
      zero.select(VectorFunctions.cosineComposed(col("a"), col("b")))
        .collect()
    }
  }

  test("fused cosine == scalar reference on generated vectors (negatives, zeros, tiny/huge magnitudes)") {
    // one batch of generated pairs evaluated through the REAL codegen
    // path, checked bitwise against a driver-side scalar reference that
    // mirrors the expression's accumulation order
    val rnd = new scala.util.Random(7)
    def vec(n: Int): Seq[Double] = Seq.fill(n)(rnd.nextInt(9) match {
      case 0 => 0.0
      case 1 => -0.0
      case 2 => 1e-300
      case 3 => -1e300
      case k => (rnd.nextDouble() - 0.5) * math.pow(10, k - 4)
    })
    val pairs = (1 to 300).map { i =>
      val n = rnd.nextInt(8) + 1
      (i.toLong, vec(n), vec(n))
    }
    def ref(a: Seq[Double], b: Seq[Double]): Option[Double] = {
      var sab = 0.0; var saa = 0.0; var sbb = 0.0
      a.indices.foreach { i =>
        sab += a(i) * b(i); saa += a(i) * a(i); sbb += b(i) * b(i)
      }
      val den = math.sqrt(saa * sbb)
      if (den == 0.0) None else Some(sab / den)
    }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"), VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[(Long, Option[Double])].collect().toMap
    pairs.foreach { case (id, a, b) =>
      val expected = ref(a, b)
      (got(id), expected) match {
        case (Some(g), Some(e)) =>
          assert(java.lang.Double.doubleToLongBits(g) ==
            java.lang.Double.doubleToLongBits(e), s"pair $id: $g != $e")
        case (g, e) => assert(g == e, s"pair $id: $g != $e")
      }
    }
  }

  test("fused cosine codegen engages and is SQL-registered via extensions") {
    val plan = Tables.embeddings(spark, sf0001)
      .select(VectorFunctions.cosine(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_cosine"), plan.take(500))
  }

  test("fused int8 quantizer == composed barrier form bitwise on fixture embeddings") {
    import graft.functions.QuantizeInt8
    // the composed form (with its eval-once exchange barrier) is the
    // reference semantics the DuckDB oracle mirrors; the fused expression
    // must reproduce its strings exactly
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val composed = e
      .select(col("vec_id"), col("v"),
        array_max(transform(col("v"), x => abs(x))).as("maxabs"))
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        array_join(transform(col("v"), x =>
          floor(x * 127 / col("maxabs") + 0.5).cast("int")), ",").as("q8"))
      .as[(Long, String)].collect().toMap
    val fused = e.select(col("vec_id"),
        QuantizeInt8.quantize(col("v")).as("q8"))
      .as[(Long, String)].collect().toMap
    assert(fused.nonEmpty && fused == composed)
  }

  test("fused unit-normalize == composed barrier form bitwise on fixture embeddings") {
    import graft.functions.UnitNormalize
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val composed = e
      .select(col("vec_id"), col("v"),
        sqrt(VectorFunctions.dot(col("v"), col("v"))).as("nrm"))
      .repartition(col("vec_id"))
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))
      .as[(Long, Seq[Double])].collect().toMap
    val fused = e.select(col("vec_id"),
        UnitNormalize.unit(col("v")).as("u"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(fused.nonEmpty && fused.keySet == composed.keySet)
    fused.foreach { case (id, u) =>
      val c = composed(id)
      assert(u.length == c.length, s"vec $id")
      u.zip(c).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b), s"vec $id: $a != $b")
      }
    }
  }

  test("fused unit-normalize edge cases: zero vector and null element -> NULL, not Inf/NaN") {
    import graft.functions.UnitNormalize
    val df = Seq(
      (1L, Some(Seq[java.lang.Double](3.0, 4.0))),
      (2L, Some(Seq[java.lang.Double](0.0, 0.0))), // composed emits Inf/NaN that silently poison cosines
      (3L, Some(Seq[java.lang.Double](1.0, null))),
      (4L, None))
      .toDF("id", "v")
    val got = df.select(col("id"), UnitNormalize.unit(col("v")).as("u"))
      .as[(Long, Option[Seq[Double]])].collect().toMap
    assert(got(1L) == Some(Seq(0.6, 0.8)))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
    assert(got(4L).isEmpty)
  }

  test("fused quantizer/normalizer == scalar references on adversarial vectors") {
    import graft.functions.{QuantizeInt8, UnitNormalize}
    // same adversarial generator as the cosine property test: zeros,
    // signed zeros, denormal-scale and near-overflow magnitudes
    val rnd = new scala.util.Random(11)
    def vec(n: Int): Seq[Double] = Seq.fill(n)(rnd.nextInt(9) match {
      case 0 => 0.0
      case 1 => -0.0
      case 2 => 1e-300
      case 3 => -1e300
      case k => (rnd.nextDouble() - 0.5) * math.pow(10, k - 4)
    })
    val rows = (1 to 300).map(i => (i.toLong, vec(rnd.nextInt(8) + 1)))
    def refQ(v: Seq[Double]): Option[String] = {
      val maxabs = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x)))
      if (v.nonEmpty && maxabs == 0.0) None
      else Some(v.map(x => math.floor(x * 127 / maxabs + 0.5).toInt)
        .mkString(","))
    }
    def refU(v: Seq[Double]): Option[Seq[Double]] = {
      var ss = 0.0
      v.foreach(x => ss += x * x)
      val nrm = math.sqrt(ss)
      if (nrm == 0.0) None else Some(v.map(_ / nrm))
    }
    val got = rows.toDF("id", "v")
      .select(col("id"), QuantizeInt8.quantize(col("v")).as("q"),
        UnitNormalize.unit(col("v")).as("u"))
      .as[(Long, Option[String], Option[Seq[Double]])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (id, v) =>
      val (q, u) = got(id)
      assert(q == refQ(v), s"quantize $id: $q != ${refQ(v)}")
      (u, refU(v)) match {
        case (Some(g), Some(e)) =>
          assert(g.length == e.length, s"unit $id")
          g.zip(e).foreach { case (a, b) =>
            assert(java.lang.Double.doubleToLongBits(a) ==
              java.lang.Double.doubleToLongBits(b), s"unit $id: $a != $b")
          }
        case (g, e) => assert(g == e, s"unit $id: $g != $e")
      }
    }
    // a huge-magnitude vector overflows ss to +Inf -> nrm Inf -> elements
    // collapse to 0.0/-0.0: the scalar reference reproduces that too (the
    // generator's 1e300 entries exercise it above); pin it explicitly
    val big = Seq(1e300, -1e300, 1e300)
    assert(refU(big).get.forall(x => x == 0.0))
  }

  test("native expressions: interpreted eval == codegen on fixture vectors") {
    import graft.functions.{QuantizeInt8, UnitNormalize}
    // Expressions run interpreted in constant folding / fallback paths;
    // both implementations must agree or results depend on which path
    // the planner happens to take. Factory mode alone is NOT enough —
    // whole-stage codegen reads only spark.sql.codegen.wholeStage, so
    // without disabling it both legs would run doGenCode and the test
    // would be vacuous (review-caught; same class as the AQE audit bug).
    val factoryKey = "spark.sql.codegen.factoryMode"
    val wscgKey = "spark.sql.codegen.wholeStage"
    val prevFactory = spark.conf.get(factoryKey)
    val prevWscg = spark.conf.get(wscgKey)
    val e = Tables.embeddings(spark, sf0001).limit(300)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def run(): Map[Long, (String, Seq[Double], Double)] =
      e.select(col("vec_id"),
          QuantizeInt8.quantize(col("v")).as("q"),
          UnitNormalize.unit(col("v")).as("u"),
          VectorFunctions.cosine(col("v"), col("v")).as("c"))
        .as[(Long, String, Seq[Double], Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def withConf[T](factory: String, wscg: String)(body: => T): T =
      try {
        spark.conf.set(factoryKey, factory)
        spark.conf.set(wscgKey, wscg)
        body
      } finally {
        spark.conf.set(factoryKey, prevFactory)
        spark.conf.set(wscgKey, prevWscg)
      }
    val withCodegen = withConf("CODEGEN_ONLY", "true")(run())
    val interpreted = withConf("NO_CODEGEN", "false")(run())
    assert(withCodegen.nonEmpty && withCodegen == interpreted)
  }

  test("fused int8 quantizer edge cases: empty, null element, zero vector, null input") {
    import graft.functions.QuantizeInt8
    val df = Seq(
      (1L, Some(Seq[java.lang.Double](2.0, -4.0, 1.0))),
      (2L, Some(Seq.empty[java.lang.Double])),
      (3L, Some(Seq[java.lang.Double](1.0, null, 3.0))),
      (4L, Some(Seq[java.lang.Double](0.0, 0.0))), // composed form would ANSI-throw on NaN cast
      (5L, None),
      (6L, Some(Seq[java.lang.Double](1.0, Double.NaN, 3.0))),
      (7L, Some(Seq[java.lang.Double](1.0, Double.PositiveInfinity))),
      (8L, Some(Seq[java.lang.Double](Double.NegativeInfinity, 2.0))))
      .toDF("id", "v")
    val got = df.select(col("id"), QuantizeInt8.quantize(col("v")).as("q8"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L) == Some("64,-127,32"))
    assert(got(2L) == Some(""))
    assert(got(3L).isEmpty) // null element -> null row, not a silent skip
    assert(got(4L).isEmpty) // zero-norm -> NULL, never an ANSI kill
    assert(got(5L).isEmpty)
    // non-finite element -> NULL: NaN would skip the maxabs pass
    // (v > maxabs is false for NaN) and Infinity would quantize every
    // finite element to 0 and itself to floor(Inf/Inf)=NaN -> 0 — both
    // silently emitting "0"s where the composed form's ANSI cast throws.
    // Pinned as NULL (degenerate input doctrine, same as zero-norm).
    assert(got(6L).isEmpty)
    assert(got(7L).isEmpty) // +Inf element (review-caught gap in the NaN fix)
    assert(got(8L).isEmpty) // -Inf element
  }

  test("nearest-cell constructor rejects ragged and empty centroid matrices") {
    import graft.functions.NearestCell
    // ragged: interpreted eval used to throw AIOOBE while codegen clamped
    // and silently computed a partial dot — path-dependent results
    assertThrows[IllegalArgumentException] {
      NearestCell.nearest(col("v"), Seq(Seq(1.0, 2.0), Seq(3.0)))
    }
    // empty: an empty input vector would land in "cell 0" instead of erroring
    assertThrows[IllegalArgumentException] {
      NearestCell.nearest(col("v"), Seq.empty)
    }
  }

}
