package graft.sources

import org.apache.parquet.io.{DelegatingSeekableInputStream, InputFile, OutputFile,
  PositionOutputStream, SeekableInputStream}
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** java.nio-backed parquet I/O for the manifest table's data files.
  *
  * The manifest format is local-filesystem-native by design — every commit,
  * manifest segment and marker already goes through java.nio (ManifestTables) —
  * but the parquet data files were opened through Hadoop's ChecksumFileSystem,
  * which costs two file creations per data file (payload + .crc sidecar) and
  * several ms of wrapper setup per open on this kernel. Measured r06: ~12 ms per
  * ParquetWriter open through Hadoop vs ~1 ms through nio — the dominant cost of
  * a many-file hidden-partition ingest. Paths with a URI scheme (never produced
  * by this table format) keep the Hadoop path via the callers' fallback.
  */
private[graft] object NioParquetIO {

  def isLocal(path: String): Boolean = !path.contains("://")

  final class NioOutputFile(p: Path) extends OutputFile {
    private def open(opts: StandardOpenOption*): PositionOutputStream = {
      val parent = p.getParent
      if (parent != null) Files.createDirectories(parent)
      val os = new java.io.BufferedOutputStream(Files.newOutputStream(p, opts: _*), 1 << 16)
      new PositionOutputStream {
        private var pos = 0L
        override def getPos: Long = pos
        override def write(b: Int): Unit = { os.write(b); pos += 1 }
        override def write(b: Array[Byte]): Unit = { os.write(b); pos += b.length }
        override def write(b: Array[Byte], off: Int, len: Int): Unit = {
          os.write(b, off, len); pos += len
        }
        override def flush(): Unit = os.flush()
        override def close(): Unit = os.close()
      }
    }
    override def create(blockSizeHint: Long): PositionOutputStream =
      open(StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    override def createOrOverwrite(blockSizeHint: Long): PositionOutputStream =
      open(StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
    override def supportsBlockSize(): Boolean = false
    override def defaultBlockSize(): Long = 0L
    override def getPath: String = p.toString
  }

  final class NioInputFile(p: Path) extends InputFile {
    private lazy val len = Files.size(p)
    override def getLength: Long = len
    override def newStream(): SeekableInputStream = {
      val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.READ)
      val in = java.nio.channels.Channels.newInputStream(ch)
      new DelegatingSeekableInputStream(in) {
        override def getPos: Long = ch.position()
        override def seek(newPos: Long): Unit = { ch.position(newPos); () }
        override def close(): Unit = { in.close(); ch.close() }
      }
    }
    override def toString: String = p.toString
  }

  def output(path: String): NioOutputFile = new NioOutputFile(Paths.get(path))
  def input(path: String): NioInputFile = new NioInputFile(Paths.get(path))
}
