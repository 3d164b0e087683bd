package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** Diagnostic: which TPC-H plans carry runtime Bloom filters, with the
  * selectivity-gated prune rule (plans/PruneWeakBloom.scala) off vs on.
  * Evidence artifact for the plan gate — run:
  *   SPARK_GRAFT_SF_DIR=target/scale/sf10 sbt "runMain graft.BloomAudit"
  */
object BloomAudit {

  def bloomCount(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach { p =>
      p.expressions.foreach(_.foreach {
        case _: BloomFilterMightContain => n += 1
        case _ => ()
      })
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/scale/sf10")
    val spark = Engine
      .configure(SparkSession.builder()
        .master(s"local[${Engine.defaultCpus}]").appName("graft-bloom-audit"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = (1 to 22).map(i => f"tpch_q$i%02d")
    queries.foreach { q =>
      val counts = Seq(false, true).map { prune =>
        val s = spark.newSession()
        s.conf.set("spark.graft.bloom.prune", prune.toString)
        bloomCount(SparkEntry.queries(q)(s, dir))
      }
      if (counts.exists(_ > 0))
        println(f"$q%-10s blooms: unpruned=${counts(0)} pruned=${counts(1)}")
    }
    // Interleaved A/B timing: GRAFT_BLOOM_AB=q1,q2 runs each query with the
    // prune rule off/on ALTERNATING run-by-run in one JVM (ABABAB...), so
    // machine drift hits both arms equally — the only protocol that
    // produced stable bloom deltas on this box (single-arm medians varied
    // +-20% between identical configs).
    sys.env.get("GRAFT_BLOOM_AB").foreach { qlist =>
      val nRuns = 5
      qlist.split(',').map(_.trim).filter(_.nonEmpty).foreach { q =>
        def once(prune: Boolean): Double = {
          val s = spark.newSession()
          s.conf.set("spark.graft.bloom.prune", prune.toString)
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(s, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once(false); once(true) // warmup both arms
        val (offs, ons) = (1 to nRuns).map(_ => (once(false), once(true))).unzip
        def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
        println(f"$q%-10s prune-off=${med(offs)}%.3f s  prune-on=${med(ons)}%.3f s  " +
          f"delta=${100 * (med(ons) - med(offs)) / med(offs)}%.1f%%  " +
          s"runs_off=${offs.map(x => f"$x%.2f").mkString(",")} " +
          s"runs_on=${ons.map(x => f"$x%.2f").mkString(",")}")
      }
    }

    // debug detail for one query: each bloom's creation plan + estimate
    sys.env.get("GRAFT_BLOOM_DEBUG").foreach { q =>
      val s = spark.newSession()
      s.conf.set("spark.graft.bloom.prune", "false")
      val df = SparkEntry.queries(q)(s, dir)
      df.queryExecution.optimizedPlan.foreach { p =>
        p.expressions.foreach(_.foreach {
          case b: BloomFilterMightContain =>
            b.bloomFilterExpression match {
              case sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery =>
                println("=== bloom creation plan ===")
                println(sq.plan.treeString)
                println("estimate: " + graft.plans.PruneWeakBloom.creationSelectivity(sq.plan))
              case other => println("non-subquery bloom expr: " + other)
            }
          case _ => ()
        })
      }
    }
    spark.stop()
  }
}
