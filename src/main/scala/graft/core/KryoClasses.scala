package graft.core

/** Kryo registration list for the cube pipeline's shuffle payloads.
  *
  * The engine moves fragments through `Encoders.kryo` binary columns; with
  * the classes registered, Kryo writes small class ids instead of fully
  * qualified class names per record — at 100 TB the rechunk shuffle's
  * dominant payload is fragment bytes, so per-record framing overhead
  * matters. Wire into any session that runs cube pipelines:
  *
  *   .config("spark.kryo.classesToRegister", KryoClasses.names)
  */
object KryoClasses {
  val classes: Seq[Class[_]] = Seq(
    classOf[Index], classOf[Dimension], classOf[Pos],
    classOf[Fragment], classOf[Variable], classOf[NDArray],
    classOf[CubeSchema], classOf[VarSpec], classOf[Slc],
    CombineOp.getClass,
    classOf[graft.kerchunk.RefSet], classOf[graft.kerchunk.Ref],
    classOf[Array[Int]], classOf[Array[Long]],
    classOf[Array[Float]], classOf[Array[Double]],
    classOf[Array[Byte]], classOf[Array[Short]],
    classOf[Vector[_]], classOf[Map[_, _]])

  def names: String = classes.map(_.getName).mkString(",")
}
