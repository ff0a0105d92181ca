package graft

import graft.functions.PolyHash
import graft.model.ResolutionDim
import graft.ops.{Batching, FlowScore}
import graft.sinks.Report
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5.2). */
object GraftProperties extends Properties("graft") {

  property("flow score is always in [0, 100]") =
    forAll(Gen.chooseNum(0, 100000), Gen.chooseNum(0, 100000)) { (det, err) =>
      val s = FlowScore.score(det, err)
      s >= 0 && s <= 100
    }

  property("flow score is 100 iff no errors and some detections") =
    forAll(Gen.chooseNum(1, 100000)) { det =>
      FlowScore.score(det, 0) == 100 && FlowScore.score(det, 1) < 100
    }

  property("histogram buckets <60 / 60-80 / >80-100 partition any score set") =
    forAll(Gen.listOf(Gen.chooseNum(0, 100))) { scores =>
      val lt60 = scores.count(_ < 60)
      val mid = scores.count(s => s >= 60 && s <= 80)
      val hi = scores.count(s => s > 80 && s <= 100)
      lt60 + mid + hi == scores.size
    }

  property("driver-side batching covers every row exactly once, in order") =
    forAll(Gen.listOf(Gen.alphaStr), Gen.chooseNum(1, 50)) { (rows, size) =>
      Batching.chunk(rows, size).flatten == rows
    }

  property("batch sizes are `size` except possibly the last") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr), Gen.chooseNum(1, 50)) { (rows, size) =>
      val chunks = Batching.chunk(rows, size)
      chunks.dropRight(1).forall(_.size == size) && chunks.last.size <= size
    }

  property("webhook messages never exceed the trim point + suffix") =
    forAll(Gen.asciiPrintableStr, Gen.chooseNum(0, 3)) { (s, rep) =>
      val msg = s * (1 << rep)
      Report.safeMessage(msg).length <= Report.TrimTo + Report.TruncationSuffix.length
    }

  property("webhook escaping strips CR and escapes quote/backslash/newline") =
    forAll(Gen.asciiPrintableStr) { s =>
      val e = Report.safeMessage(s + "\r\n\"\\")
      !e.contains("\r") && !e.contains("\n")
    }

  property("resolution classify lands in the 27-value domain") =
    forAll(Gen.oneOf(
      Gen.oneOf(ResolutionDim.byString.map(_._1)),
      Gen.alphaNumStr,
      Gen.const(""), Gen.const("0x0"))) { res =>
      val t = ResolutionDim.classify(res)
      t >= 1 && t <= 27
    }

  property("poly_hash stays within [0, mod)") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = PolyHash.hash(s)
      h >= 0 && h < PolyHash.DefaultMod
    }

  property("markdown render keeps one output row per csv line (+separator)") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumStr)) { lines =>
      val md = Report.csvLinesToMarkdown(lines)
      md.linesIterator.size == lines.size + 1
    }
}
