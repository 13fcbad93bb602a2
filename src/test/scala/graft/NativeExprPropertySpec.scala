package graft

import graft.functions.{NativeFunctions => NF, TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._

/** Randomized parity: native expressions vs declarative forms over
  * generated inputs far outside the testdata distribution — empty and
  * 1-char tokens, repeated tokens, degenerate and near-parallel vectors.
  * Parity domain is printable ASCII (SURVEY §6; the oracle corpus is
  * ASCII) — generators stay inside it deliberately. */
class NativeExprPropertySpec extends GraftSuite {

  private val rnd = new scala.util.Random(20260812L)

  test("shingle parity holds on 200 random ASCII token arrays") {
    import spark.implicits._
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789.,!?-"
    def tok(): String = {
      val n = rnd.nextInt(8) // 0..7 chars — includes empty tokens
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(60))(tok()))
    }
    val df = docs.toDF("id", "toks")
      .withColumn("tv", TF.tokenVals(col("toks")))
      .select(col("id"),
        NF.shingleHashes(col("toks")).as("native"),
        TF.shingleHashesFromVals(col("tv")).as("decl"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"row ${r.getLong(0)} diverged")
    }
  }

  test("cosine parity holds on 200 random float vector pairs, bit-for-bit") {
    import spark.implicits._
    def vec(dim: Int): Array[Float] =
      Array.fill(dim)((rnd.nextGaussian() * (1 + rnd.nextInt(100))).toFloat)
    val pairs = (1 to 200).map { i =>
      val d = 1 + rnd.nextInt(128)
      val a = vec(d)
      // mix: random partner, scaled copy (cos≈±1), near-parallel
      val b = rnd.nextInt(3) match {
        case 0 => vec(d)
        case 1 => a.map(_ * (if (rnd.nextBoolean()) 2.5f else -0.5f))
        case _ => a.zipWithIndex.map { case (x, j) => if (j == 0) x + 0.01f else x }
      }
      (i.toLong, a, b)
    }
    val df = pairs.toDF("id", "a", "b")
      .select(col("id"),
        VF.cosine(col("a"), col("b")).as("native"),
        VF.cosineDeclarative(col("a"), col("b")).as("decl"))
    df.collect().foreach { r =>
      val n = java.lang.Double.doubleToLongBits(r.getDouble(1))
      val d = java.lang.Double.doubleToLongBits(r.getDouble(2))
      assert(n == d, s"row ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("winnow parity holds on random, periodic, and boundary-length ASCII texts") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = 12; val k = 5
    val alphabet = "ab cde.x" // tiny alphabet -> frequent hash ties
    def txt(n: Int): String =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (1 to 120).map { i =>
      val t = rnd.nextInt(4) match {
        case 0 => txt(rnd.nextInt(200))          // incl. below-window lengths
        case 1 => txt(w + k - 2 + rnd.nextInt(3)) // straddle the full-window boundary
        case 2 => { val u = txt(1 + rnd.nextInt(6)); u * (1 + rnd.nextInt(40)) } // periodic
        case _ => txt(40) + txt(8) * 10           // long tail repetition
      }
      (i.toLong, t)
    }
    val df = docs.toDF("doc_id", "text")
    val native = df
      .select(col("doc_id"), NF.winnowFps(col("text"), w, k).as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val win = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, k - 1)
    val decl = df.filter(length(col("text")) >= w)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        explode(sequence(lit(1), length(col("text")) - w + 1)).as("i"))
      .select(col("doc_id"), col("i"), col("len"),
        conv(substring(md5(col("text").substr(col("i"), lit(w))), 1, 15), 16, 10)
          .cast("long").as("hv"))
      .withColumn("fp", min(col("hv")).over(win))
      .filter(col("i") <= col("len") - (w + k) + 2)
      .select(col("doc_id"), col("fp")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    docs.foreach { case (id, _) =>
      assert(native.getOrElse(id, Set.empty) == decl.getOrElse(id, Set.empty),
        s"doc $id winnow divergence")
    }
  }

  test("argmin/sqdist/pca-project parity holds on 200 random vector-codebook cases") {
    import spark.implicits._
    import graft.streaming.StreamVecIndex
    def vec(dim: Int): Array[Float] =
      Array.fill(dim)((rnd.nextGaussian() * (1 + rnd.nextInt(10))).toFloat)
    // argmin: per case a random dim, random k, duplicated-centroid ties
    (1 to 10).foreach { _ =>
      val d = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(12)
      val cents0 = IndexedSeq.fill(k)(vec(d))
      // force at least one exact duplicate so the tie rule is exercised
      val cents = if (k >= 2) cents0.updated(k - 1, cents0(0).clone) else cents0
      val rows = (1 to 20).map(i => (i.toLong, vec(d)))
      val df = rows.toDF("id", "emb").select(col("id"),
        StreamVecIndex.listIdOf(col("emb"), cents).as("native"),
        StreamVecIndex.listIdOfDeclarative(col("emb"), cents).as("decl"))
      df.collect().foreach(r => assert(r.getInt(1) == r.getInt(2),
        s"argmin diverged on row ${r.getLong(0)}: ${r.getInt(1)} vs ${r.getInt(2)}"))
    }
    // sqdist + pca-project: double parity vs the HOF forms, random dims
    (1 to 10).foreach { _ =>
      val d = 1 + rnd.nextInt(32)
      val kAx = 1 + rnd.nextInt(d)
      val mean = Array.fill(d)(rnd.nextGaussian())
      val axes = Seq.fill(kAx)(Array.fill(d)(rnd.nextGaussian()))
      val rows = (1 to 20).map(i => (i.toLong, vec(d)))
      val got = rows.toDF("id", "emb")
        .select(col("id"),
          NF.pcaProject(col("emb"), mean.toSeq, axes.map(_.toSeq)).as("p"),
          col("emb"))
        .collect()
      got.foreach { r =>
        val v = r.getSeq[Float](2).toArray
        val want = axes.map { a =>
          var s = 0.0; var t = 0
          while (t < d) { s += (v(t).toDouble - mean(t)) * a(t); t += 1 }
          s
        }
        val p = r.getSeq[Double](1)
        assert(p.length == kAx)
        p.zip(want).foreach { case (x, w) =>
          assert(java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(w),
            s"pca-project diverged: $x vs $w")
        }
      }
      val pd = rows.toDF("id", "emb")
        .select(transform(col("emb"), x => x.cast("double")).as("a"))
        .crossJoin(rows.take(3).toDF("id2", "emb2")
          .select(transform(col("emb2"), x => x.cast("double")).as("b")))
        .select(NF.sqDist(col("a"), col("b")).as("native"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, v) => acc + v).as("decl"))
        .collect()
      pd.foreach(r => assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"sqdist diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
    }
  }

  test("sq8 encode/dot parity holds on random scales incl. planted half-code ties") {
    import spark.implicits._
    (1 to 8).foreach { _ =>
      val d = 1 + rnd.nextInt(96)
      val scale = math.pow(10, rnd.nextInt(7) - 3) * (0.5 + rnd.nextDouble())
      val rows = (1 to 40).map { i =>
        (i.toLong, Array.fill(d)(rnd.nextInt(5) match {
          case 0 => 0f
          case 1 => ((rnd.nextInt(255) - 127) / scale).toFloat // near-integer codes
          case 2 => (((rnd.nextInt(255) - 127) + 0.5) / scale).toFloat // near .5 ties
          case _ => (rnd.nextGaussian() * 50 / scale).toFloat
        }))
      }
      val df = rows.toDF("id", "emb").select(col("id"),
        NF.sq8Encode(col("emb"), scale).as("n"),
        graft.operators.Similarity.sq8EncodeDeclarative(col("emb"), scale).as("d"))
      df.collect().foreach(r => assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"row ${r.getLong(0)} sq8 encode diverged (scale $scale)"))
      val codes = (1 to 30).map(i => (i.toLong, Array.fill(d)(rnd.nextInt(255) - 127)))
      val cd = codes.toDF("id", "c")
      cd.crossJoin(cd.limit(3).select(col("c").as("c2")))
        .select(NF.sq8Dot(col("c"), col("c2")).as("n"),
          graft.operators.Similarity.sq8DotDeclarative(col("c"), col("c2")).as("d"))
        .collect().foreach(r => assert(r.getLong(0) == r.getLong(1),
          s"sq8 dot diverged: ${r.getLong(0)} vs ${r.getLong(1)}"))
    }
  }

  test("sym-ids parity holds on random vocab/encodings incl. empty strings") {
    import spark.implicits._
    (1 to 8).foreach { _ =>
      val alphabet = "abcdefgh"
      val symbols = ((1 to 20).map(_ =>
        Seq.fill(1 + rnd.nextInt(4))(alphabet(rnd.nextInt(alphabet.length))).mkString)
        :+ "</w>").distinct
      val vocab = symbols.sorted.toIndexedSeq
      val enc = (1 to 40).map { i =>
        val syms = Seq.fill(rnd.nextInt(30))(symbols(rnd.nextInt(symbols.length)))
        (i.toLong,
          if (syms.isEmpty) "" else syms.mkString("\u0001", "\u0001", "\u0001"))
      }
      val df = enc.toDF("id", "enc").select(col("id"),
        NF.symIds(col("enc"), vocab).as("n"),
        graft.operators.Pipelines.p12SymIdsDeclarative(col("enc"), vocab).as("d"))
      df.collect().foreach(r => assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"row ${r.getLong(0)} sym-ids diverged"))
    }
  }
}
