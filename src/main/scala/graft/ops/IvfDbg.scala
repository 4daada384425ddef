package graft.ops
import org.apache.spark.sql.Column
object IvfDbg { def pc(v: Column, c: Array[Array[Double]], k: Int): Column = Ivf.probeCells(v, c, k) }
