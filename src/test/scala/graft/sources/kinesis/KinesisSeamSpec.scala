package graft.sources.kinesis

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Pins the real-AWS seam's documented offline behavior (SURVEY §2.1 /
  * round-11 verdict #6): this build ships no AWS SDK and has no egress, so
  * selecting the real-AWS factory must fail FAST with instructions — never
  * half-work. Lives in the kinesis package to reach the private[kinesis]
  * option-routing seam itself, not just the public case class.
  */
class KinesisSeamSpec extends graft.GraftSpec {

  test("no fake.id routes to the real-AWS factory, which fails fast with instructions") {
    val m = new java.util.HashMap[String, String]()
    m.put("streams", "s1")
    m.put("regionName", "us-east-1")
    m.put("awsAccessKeyId", "AKIA_TEST")
    val f = KinesisTableProvider.clientFactory(new CaseInsensitiveStringMap(m))
    val aws = f match {
      case a: AwsClientFactory => a
      case other => fail(s"expected AwsClientFactory, got $other")
    }
    // The full reference option surface must survive routing (user code is
    // written against the final API even though create() is blocked).
    assert(aws.regionName.contains("us-east-1"))
    assert(aws.awsAccessKeyId.contains("AKIA_TEST"))
    val e = intercept[UnsupportedOperationException](aws.create())
    assert(e.getMessage.contains("AWS SDK") && e.getMessage.contains("fake.id"),
      s"fail-fast message must carry wiring instructions, got: ${e.getMessage}")
  }

  test("fake.id routes to the in-memory service factory") {
    val m = new java.util.HashMap[String, String]()
    m.put("streams", "s1")
    m.put("fake.id", "seam_route_check")
    val f = KinesisTableProvider.clientFactory(new CaseInsensitiveStringMap(m))
    assert(f.isInstanceOf[FakeClientFactory])
  }
}
