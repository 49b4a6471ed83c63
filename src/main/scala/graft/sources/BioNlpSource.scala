package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for BioNLP standoff annotation files.
  *
  * The reference round-trips annotations through BioNLP-format files on GCS
  * (etl/ConceptAnnotationExportPipeline.java, file/conversion/bionlp
  * serializers); this is that storage layout as a first-class Spark source:
  * a directory of `doc_id=N/` partitions, each holding text files of
  * `T{n}\tTYPE start end\ttext` lines, readable with
  * `spark.read.format("graft.sources.BioNlpSource").load(dir)`.
  *
  * Scale behavior, which is the point of doing this as DSv2 rather than
  * `spark.read.text` + parsing:
  *  - **partition pruning**: `doc_id` comes from the directory name, so
  *    pushed `doc_id = v` / `doc_id IN (...)` filters skip whole files at
  *    planning time (no I/O for pruned docs);
  *  - **column pruning**: the reader materializes only the requested
  *    columns (a `select(doc_id, tok)` never parses spans);
  *  - **size-balanced split planning**: files are bin-packed into input
  *    partitions by byte size, so one giant doc doesn't serialize a wave.
  * I/O goes through the Hadoop FileSystem API, so the same source reads
  * local, HDFS, or object-store paths.
  */
class BioNlpSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BioNlpSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new BioNlpTable(properties.get("path"))
}

object BioNlpSource {
  val schema: StructType = StructType.fromDDL(
    "doc_id BIGINT, t_num BIGINT, concept_type STRING, char_start BIGINT, char_end BIGINT, tok STRING")

  /** (path, docId, len) for every data file under the root, doc id parsed
    * from the `doc_id=N` directory component.
    *
    * Local paths walk the tree with java.nio: Hadoop's RawLocalFileSystem
    * materializes permission bits for each LocatedFileStatus by forking an
    * `ls` per file, which turns a 250-file listing into seconds of planning
    * time. Non-local schemes (HDFS, object stores) use the Hadoop listing,
    * where recursive listFiles is the efficient bulk call. */
  private[sources] def listFiles(root: String): Seq[(String, Long, Long)] = {
    val rootPath = new Path(root)
    val scheme = rootPath.toUri.getScheme
    val out = Seq.newBuilder[(String, Long, Long)]
    def keep(dirName: String, fileName: String): Boolean =
      !fileName.startsWith(".") && !fileName.startsWith("_") && dirName.startsWith("doc_id=")
    if (scheme == null || scheme == "file") {
      val base = java.nio.file.Paths.get(rootPath.toUri.getPath)
      val stream = java.nio.file.Files.walk(base)
      try stream.forEach { p =>
        val f = p.toFile
        if (f.isFile && keep(p.getParent.getFileName.toString, p.getFileName.toString))
          out += ((p.toString, p.getParent.getFileName.toString.stripPrefix("doc_id=").toLong, f.length()))
      } finally stream.close()
    } else {
      val fs = rootPath.getFileSystem(new Configuration())
      val it = fs.listFiles(rootPath, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && keep(f.getPath.getParent.getName, f.getPath.getName))
          out += ((f.getPath.toString, f.getPath.getParent.getName.stripPrefix("doc_id=").toLong, f.getLen))
      }
    }
    out.result()
  }
}

class BioNlpTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"bionlp:$path"
  override def schema(): StructType = BioNlpSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BioNlpScanBuilder(path)
}

class BioNlpScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = BioNlpSource.schema
  private var docIdKeep: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** doc_id equality/membership prunes whole files at planning time and
    * needs no re-evaluation; everything else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("doc_id", _: Long) | In("doc_id", _) => true
      case _ => false
    }
    val keep = accepted.flatMap {
      case EqualTo(_, v: Long) => Seq(v)
      case In(_, vs) => vs.toSeq.collect { case v: Long => v }
      case _ => Seq.empty[Long]
    }.toSet
    if (accepted.nonEmpty) { docIdKeep = Some(keep); pushed = accepted }
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new BioNlpScan(path, required, docIdKeep)
}

class BioNlpScan(path: String, required: StructType, docIdKeep: Option[Set[Long]])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"BioNlpScan(path=$path, columns=${required.fieldNames.mkString(",")}, " +
      s"prunedDocs=${docIdKeep.map(_.size).getOrElse(-1)})"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = BioNlpSource.listFiles(path)
      .filter { case (_, docId, _) => docIdKeep.forall(_.contains(docId)) }
    if (files.isEmpty) return Array.empty
    // size-balanced bin packing: sort descending by length, greedily assign
    // to the currently-smallest of ~2×parallelism bins
    val nBins = math.min(files.size, 64)
    val bins = Array.fill(nBins)((0L, List.newBuilder[(String, Long)]))
    for ((f, docId, len) <- files.sortBy(-_._3)) {
      val i = bins.indices.minBy(bins(_)._1)
      bins(i) = (bins(i)._1 + len, bins(i)._2 += ((f, docId)))
    }
    bins.filter(_._1 > 0).map(b => BioNlpInputPartition(b._2.result().toArray): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory = new BioNlpReaderFactory(required)
}

case class BioNlpInputPartition(files: Array[(String, Long)]) extends InputPartition

class BioNlpReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BioNlpPartitionReader(partition.asInstanceOf[BioNlpInputPartition], required)
}

/** Streams the partition's files line by line; parses only the fields the
  * scan requires. */
class BioNlpPartitionReader(partition: BioNlpInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val fields = required.fieldNames
  private val needSpan = fields.exists(Set("t_num", "concept_type", "char_start", "char_end", "tok"))
  // one conf for the reader's lifetime — constructing one per file re-reads
  // the Hadoop resource chain
  private val conf = new Configuration()
  private var fileIdx = 0
  private var docId = 0L
  private var lines: Iterator[String] = Iterator.empty
  private var reader: java.io.BufferedReader = _
  private var current: InternalRow = _

  private def openNext(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (fileIdx >= partition.files.length) return false
    val (file, d) = partition.files(fileIdx)
    fileIdx += 1
    docId = d
    val p = new Path(file)
    val fs = p.getFileSystem(conf)
    reader = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    lines = Iterator.continually(reader.readLine()).takeWhile(_ != null)
    true
  }

  override def next(): Boolean = {
    while (!lines.hasNext) if (!openNext()) return false
    val line = lines.next()
    current = parse(line)
    true
  }

  private def parse(line: String): InternalRow = {
    var tNum = 0L; var cType: String = null; var cs = 0L; var ce = 0L; var tok: String = null
    if (needSpan) {
      val tab1 = line.indexOf('\t'); val tab2 = line.indexOf('\t', tab1 + 1)
      tNum = line.substring(1, tab1).toLong
      val mid = line.substring(tab1 + 1, tab2).split(' ')
      cType = mid(0); cs = mid(1).toLong; ce = mid(2).toLong
      tok = line.substring(tab2 + 1)
    }
    InternalRow.fromSeq(fields.toSeq.map {
      case "doc_id" => docId
      case "t_num" => tNum
      case "concept_type" => UTF8String.fromString(cType)
      case "char_start" => cs
      case "char_end" => ce
      case "tok" => UTF8String.fromString(tok)
    })
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (reader != null) reader.close()
}
