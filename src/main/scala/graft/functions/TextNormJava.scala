package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Static target for the `normalize()` StaticInvoke (see
  * [[TextFunctions.normalizeNFC]]): scalac emits a static forwarder
  * for the companion's method, which Catalyst codegen calls directly
  * on internal UTF8String values — no per-row boxing beyond the
  * String round-trip the JDK normalizer requires. */
class TextNormJava

object TextNormJava {
  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
}
