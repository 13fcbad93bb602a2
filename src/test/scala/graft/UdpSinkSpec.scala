package graft

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable
import graft.streaming.UdpSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class UdpSinkSpec extends GraftSuite {

  test("streamed rows arrive as UDP datagrams") {
    val receiver = new DatagramSocket() // ephemeral port on localhost
    receiver.setSoTimeout(10000)
    val got = mutable.Set.empty[String]
    val listener = new Thread(() => {
      val buf = new Array[Byte](2048)
      try {
        while (got.size < 3) {
          val p = new DatagramPacket(buf, buf.length)
          receiver.receive(p)
          got.synchronized { got += new String(p.getData, p.getOffset, p.getLength, UTF_8) }
        }
      } catch { case _: java.net.SocketTimeoutException => () }
    })
    listener.start()
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val q = UdpSink.emit(input.toDF(), "127.0.0.1", receiver.getLocalPort)
    try {
      input.addData("rec one", "rec two", "rec three")
      q.processAllAvailable()
      listener.join(10000)
      assert(got.synchronized(got.toSet) == Set("rec one", "rec two", "rec three"))
    } finally {
      q.stop()
      receiver.close()
    }
  }
}
