package graft

import graft.functions.{Sketches, TextStats}
import graft.weather._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalacheck.Properties

/** Property-based suites (SURVEY.md §5 item 4) over the pure kernels:
  * request validation, shingle hashing, text stats. Spark-level
  * invariants (resampling conservation etc.) live in the regular suites
  * where one job covers the property over a whole dataset.
  */
object GraftProperties extends Properties("graft") {

  private val word: Gen[String] = Gen.chooseNum(1, 10)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val words: Gen[List[String]] = Gen.listOfN(40, word).map(_.take(40))

  private def toArrayData(ws: List[String]) =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  property("shingleHashes: count bounded by max(words-n+1, 1); deterministic") =
    forAll(words, Gen.chooseNum(1, 5)) { (ws, n) =>
      val a = Sketches.shingleHashes(toArrayData(ws), n)
      val b = Sketches.shingleHashes(toArrayData(ws), n)
      val bound = if (ws.isEmpty) 0 else math.max(ws.size - n + 1, 1)
      a.length <= bound && a.sameElements(b) && a.length == a.distinct.length
    }

  property("shingleHashes: disjoint vocabularies never share shingles") =
    forAll(words) { ws =>
      val other = ws.map(_ + "x1") // '1' keeps it alnum but distinct
      val a = Sketches.shingleHashes(toArrayData(ws), 3).toSet
      val b = Sketches.shingleHashes(toArrayData(other), 3).toSet
      ws.isEmpty || (a & b).isEmpty
    }

  property("WordShinglesExpr: fused strings = sliding-window construction") =
    forAll(words, Gen.chooseNum(1, 5)) { (ws, n) =>
      import graft.functions.WordShinglesExpr
      import org.apache.spark.sql.catalyst.expressions.Literal
      val text = ws.mkString("  ") + "\t"  // messy separators
      val out = WordShinglesExpr(Literal(text), n).nullSafeEval(
          UTF8String.fromString(text)).asInstanceOf[GenericArrayData]
        .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString)
      val expected =
        if (ws.isEmpty) Seq.empty[String]
        else if (ws.size < n) Seq(ws.mkString(" "))
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      out.toSeq == expected
    }

  property("TextStats: quality in [0,1], words counted, lang from the profile set") =
    forAll(Gen.listOfN(30, word)) { ws =>
      val text = ws.mkString(" ")
      val (nWords, punct, stop, meanLen, quality, lang, tokenEst) =
        TextStats.compute(text)
      nWords == ws.count(_.nonEmpty) &&
        quality >= 0.0 && quality <= 1.0 &&
        punct >= 0.0 && punct <= 1.0 && stop >= 0.0 && stop <= 1.0 &&
        (lang == "und" || TextStats.langProfiles.exists(_._1 == lang)) &&
        tokenEst >= 0 && meanLen >= 0.0
    }

  private val genLoc: Gen[Location] = for {
    lat <- Gen.chooseNum(-100.0, 100.0)
    lon <- Gen.chooseNum(-200.0, 200.0)
  } yield Location(None, Some(lat), Some(lon))

  property("F1: validation accepts exactly the in-range coordinate box") =
    forAll(genLoc) { loc =>
      val ok = Requests.validateLocation(loc).isRight
      val inRange = loc.latitude.get >= -90 && loc.latitude.get <= 90 &&
        loc.longitude.get >= -180 && loc.longitude.get <= 180
      ok == inRange
    }

  property("F5: forecast horizon always clamped to [0, 16]") =
    forAll(Gen.chooseNum(-5, 100), Gen.chooseNum(-5, 100)) { (fd, pd) =>
      Requests.validate(ForecastRequest(Location(None, Some(0.0), Some(0.0)),
        forecastDays = Some(fd), pastDays = Some(pd))) match {
        case Right(plan) =>
          plan.forecastDays >= 0 && plan.forecastDays <= 16 && plan.pastDays >= 0
        case Left(_) => false // coordinates are valid; must not reject
      }
    }

  property("F5: default applies iff neither days param is positive") =
    forAll(Gen.option(Gen.chooseNum(-5, 30)), Gen.option(Gen.chooseNum(-5, 30))) {
      (fd, pd) =>
        val plan = Requests.validate(ForecastRequest(
          Location(None, Some(0.0), Some(0.0)),
          forecastDays = fd, pastDays = pd)).toOption.get
        val anyGiven = fd.exists(_ > 0) || pd.exists(_ > 0)
        if (anyGiven) plan.forecastDays == fd.filter(_ > 0).map(d => math.min(d, 16))
          .getOrElse(0)
        else plan.forecastDays == Requests.DefaultForecastDays
    }

  property("granularity dispatch total: only 15/60/>=1440 accepted") =
    forAll(Gen.chooseNum(-10, 3000)) { g =>
      Requests.granKey(g) match {
        case Right(k) =>
          (g == 15 && k == "minutely_15") || (g == 60 && k == "hourly") ||
            (g >= 1440 && k == "daily")
        case Left(_) => g != 15 && g != 60 && g < 1440
      }
    }
}
