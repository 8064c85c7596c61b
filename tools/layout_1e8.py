"""10^8-vertex scale-layout measurement: build file-backed blocks (no O(V)
driver state) on a deterministic 2-out-degree graph, then run 3 distributed
supersteps. Prints one JSON line."""
import json, resource, sys, tempfile, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from metagraph_spark.graph import Graph
from metagraph_spark.operators.kernel import build_edge_blocks, pagerank_kernel

V = 100_000_000
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000000")
         .appName("layout-1e8").getOrCreate())

base = spark.range(V)
e1 = base.select(F.col("id").alias("src"), ((F.col("id") * 2654435761 + 1) % V).alias("dst"))
e2 = base.select(F.col("id").alias("src"), ((F.col("id") * 40503 + 7) % V).alias("dst"))
edges = e1.unionAll(e2)
nodes = base.select("id")
g = Graph(edges=edges, nodes=nodes, is_directed=True)

sd = tempfile.mkdtemp(prefix="blocks_1e8_", dir="/tmp")
t0 = time.time()
eb = build_edge_blocks(g, num_blocks=64, spill_dir=sd)
t_layout = time.time() - t0
assert eb._node_ids is None and eb._out_deg is None
rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
t1 = time.time()
res = pagerank_kernel(eb, fixed_iterations=3)
cnt = res.count()
t_run = time.time() - t1
assert eb._node_ids is None and eb._out_deg is None
s = res.agg(F.sum("rank")).collect()[0][0]
print(json.dumps({"v": V, "edges": 2*V, "layout_sec": round(t_layout,1),
                  "supersteps3_plus_assembly_sec": round(t_run,1),
                  "rows": cnt, "rank_sum": s,
                  "driver_maxrss_gb": round(rss_gb,2),
                  "edges_per_sec_per_superstep": round(2*V*3/t_run)}))
import shutil; shutil.rmtree(sd, ignore_errors=True)
spark.stop()
