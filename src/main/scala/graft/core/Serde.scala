package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInput, DataInputStream, DataOutput, DataOutputStream, IOException}

/** Versioned byte-array serialization harness.
  *
  * Capability parity with
  * /root/reference/indices/src/main/java/com/dynatrace/serialization/Serialization.java:46-100,
  * using plain DataOutput framing (no java serialization header) so shard bytes are compact
  * and stable across JVMs — they live in a BinaryType column of the Spark shard table.
  */
object Serde {

  def writeToByteArray[T](writer: (T, DataOutput) => Unit, value: T): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writer(value, out)
    out.flush()
    bos.toByteArray
  }

  def readFromByteArray[T](reader: DataInput => T, bytes: Array[Byte]): T = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    reader(in)
  }

  def checkSerialVersion(expected: Byte, actual: Byte): Unit = {
    if (expected != actual)
      throw new IOException(
        s"Incompatible serial versions: expected ${expected & 0xff} but got ${actual & 0xff}")
  }
}
