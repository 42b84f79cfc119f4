package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck soundness property for the regex→required-trigram
  * compiler ([[TrigramIndex.requiredLiterals]]) — the ONE property the
  * q181 serve's exactness rests on: for every string a pattern
  * matches, SOME compiled branch has ALL its required fragments
  * present as contiguous substrings (candidates ⊇ matches; false
  * candidates die in the rlike verify, but a violated superset
  * property would silently LOSE results). Patterns are generated from
  * the compiler's supported grammar — literal runs, alternation
  * groups, wildcards, classes, quantifiers, anchors, escapes — over
  * the same tiny alphabet as the documents, so match rates stay high
  * enough to exercise the implication. */
object TrigramRegexProps extends Properties("TrigramRegexCompiler") {

  private val alpha = "abc "

  private val literalGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))

  private val groupGen: Gen[String] = for {
    n <- Gen.chooseNum(2, 3)
    alts <- Gen.listOfN(n, Gen.chooseNum(1, 4).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf("abc".toSeq)).map(_.mkString)))
    q <- Gen.oneOf("", "", "+", "?")
  } yield alts.mkString("(", "|", ")") + q

  private val wildGen: Gen[String] =
    Gen.oneOf(".", ".*", ".+", "[ab]", "[^c]", "a*", "b?", "c+", "\\d*", "a{1,2}")

  // ADVICE r15 adversarial shapes: inline flags, \Q quoting, and
  // metachars hidden inside [...] classes — the compiler must either
  // bail (None) or still satisfy the superset property
  private val advGen: Gen[String] =
    Gen.oneOf("(?i)", "\\Qa|c\\E", "\\Qa.c\\E", "[)]a", "[(|)]", "[|]",
      "(a[)]|bb)", "([(]ab)", "[)]a|bb")

  private val segmentGen: Gen[String] =
    Gen.frequency(5 -> literalGen, 2 -> groupGen, 2 -> wildGen, 1 -> advGen)

  private val patternGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    segs <- Gen.listOfN(n, segmentGen)
    anchored <- Gen.oneOf("", "", "^")
  } yield anchored + segs.mkString

  // top-level alternation of two generated bodies, sometimes
  private val fullPatternGen: Gen[String] = Gen.frequency(
    4 -> patternGen,
    1 -> Gen.zip(patternGen, patternGen).map { case (a, b) => s"$a|$b" })

  private val docGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alpha.toSeq)).map(_.mkString))

  property("candidates ⊇ matches: every matching doc satisfies some branch") =
    Prop.forAll(fullPatternGen, Gen.listOfN(30, docGen)) { (pat, docs) =>
      val compiledRx =
        try Some(java.util.regex.Pattern.compile(pat))
        catch { case _: Exception => None } // generator produced junk — skip
      compiledRx.forall { rx =>
        val branches = TrigramIndex.requiredLiterals(pat)
        docs.forall { d =>
          val matches = rx.matcher(d).find()
          !matches || (branches match {
            case None => true // declared unprunable → full scan covers it
            case Some(bs) => bs.exists(_.forall(d.contains))
          })
        }
      }
    }

  property("ADVICE r15 regressions: flags/quoting/class-hidden metachars never lose matches") = {
    val cases = Seq(
      "(?i)foo" -> "FOO bar",          // inline flag: gram store is case-sensitive → must bail
      "\\Qabc.def\\E" -> "xabc.defy",  // quoted '.' is literal, not wildcard → must bail
      "[)]abc|bbb" -> ")abc here",     // '|' after a class: class-aware top split
      "([)]abc)" -> "x)abcy",          // ')' inside class must not end the group
      "a[|]bcd" -> "xa|bcdz",          // '|' inside class is a literal
      "[(]abcd" -> "z(abcd",           // '(' inside class must not open a group
      "(?i:ab)cde" -> "ABcde")         // flagged group: must bail
    Prop.all(cases.map { case (pat, doc) =>
      val rx = java.util.regex.Pattern.compile(pat)
      Prop(rx.matcher(doc).find() && (TrigramIndex.requiredLiterals(pat) match {
        case None => true // honest full-scan fallback
        case Some(bs) => bs.exists(_.forall(doc.contains))
      })) :| s"pattern <$pat> vs doc <$doc>"
    }: _*)
  }

  property("a pure literal compiles to itself (no weakening on the easy case)") =
    Prop.forAll(literalGen) { s =>
      TrigramIndex.requiredLiterals(s) match {
        case Some(Seq(Seq(frag))) => frag == s
        case None => s.length < 3 // short literals are honestly unprunable
        case other => false
      }
    }
}
