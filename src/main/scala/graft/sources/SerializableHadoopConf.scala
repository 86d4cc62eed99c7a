package graft.sources

/** Serializable carrier for the Hadoop Configuration (which is a Writable,
  * not Serializable) so distributed readers can open files with the
  * session's FS settings. Public-API-only equivalent of Spark's internal
  * wrapper.
  */
private[graft] final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
