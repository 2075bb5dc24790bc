package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The ONE sanctioned kernel tokenizer — every native text kernel's
  * whitespace tokenization goes through here, so the lowering step exists in
  * exactly one place and is typed to `UTF8String`: `UTF8String.toLowerCase`
  * is the EXACT code Spark's `Lower` runs, locale-independent by
  * construction. The Turkish-locale landmine (`String.toLowerCase` mapping
  * ASCII 'I' to dotless 'ı' on a `tr_TR`-default JVM, silently diverging
  * from the column-form contracts) is kept out STRUCTURALLY: LocaleProofSpec
  * bans the `toLowerCase` token outright in every other kernel source file,
  * so a future kernel cannot lower at all except through this signature —
  * where the receiver type makes the default-locale path unrepresentable.
  *
  * Token semantics (the `TextFns.words` contract): lowercase, trim, split on
  * whitespace runs, empties dropped. */
object KernelTok {

  def words(text: UTF8String): Array[String] =
    text.toLowerCase.toString.trim.split("\\s+").filter(_.nonEmpty)
}
