package graft

/** A Hadoop FileSystem registered under a NON-file scheme (`mock3://`),
  * backed by the local disk — the offline stand-in for an object store.
  *
  * Purpose (SURVEY K3): the S3 sink path cannot execute against a real
  * object store in this sandbox (zero egress, documented since round
  * 3), but everything on OUR side of the Hadoop FileSystem API —
  * URI-scheme dispatch in discovery/preflight/read/write, path
  * qualification, committer rename protocol — is exercisable offline
  * by registering a scheme and driving `cli convert` + `ParquetSink`
  * through it (`fs.mock3.impl`, exactly how `fs.s3a.impl` binds
  * S3AFileSystem). What remains untestable offline is s3a itself
  * (auth, multipart upload, eventual-consistency handling), which is
  * AWS-owned code, not this engine's.
  */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock3"
  override def getUri: java.net.URI = java.net.URI.create("mock3:///")
}
