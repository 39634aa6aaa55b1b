# Round ritual targets. The scaling evidence is freshness-checked by
# construction: `make scaling` stamps BENCH/scaling.json with the blob
# hash of the measured PageRank loop, and `make check` /
# `make scaling-fresh` FAIL whenever that file has changed since the
# measurement — a loop change can never ship with stale scaling data.

PY ?= python

.PHONY: test bench scaling multijvm membw scaling-fresh check pyfiles

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

# north-rule launch mode: zip the package for spark-submit --py-files
# (cwd-independent driver+executor imports)
pyfiles:
	$(PY) tools/make_pyfiles.py

# full scaling protocol: 3 repeats at the 2->8 criterion pair on the
# 100M-edge direct-generated graph (built on first run — the SAME input
# every recorded measurement used; --min-edges refuses a smaller graph
# so the protocol can't silently drift), plus the DRAM-bandwidth probe
# that evidences the pair choice. ~75 min. Output lands via tmp+rename
# so an aborted run can't truncate the stamped evidence in place.
BENCH_WORK ?= /tmp/ega_bench
SCALING_GRAPH ?= $(BENCH_WORK)/scaling_large
scaling:
	test -d $(SCALING_GRAPH)/edges || $(PY) tools/gen_edges.py \
		--vertices 12000000 --edges 100000000 --out $(SCALING_GRAPH)
	$(PY) tools/bench_scaling.py --repeats 3 --cpus 2 8 \
		--graph $(SCALING_GRAPH) --min-edges 90000000 \
		> BENCH/scaling.json.tmp && mv BENCH/scaling.json.tmp BENCH/scaling.json
	$(PY) tools/bench_membw.py --workers 2 8 32 --rounds 8 \
		> BENCH/membw.json.tmp && mv BENCH/membw.json.tmp BENCH/membw.json

# executor-shaped N -> 4N protocol (the north rule's criterion): 1 JVM x
# local[8] vs 4 concurrent JVMs x local[8] on the same 100M-edge graph,
# 3 repeats with steal telemetry, blob-stamped like scaling.json. ~60 min.
multijvm:
	test -d $(SCALING_GRAPH)/edges || $(PY) tools/gen_edges.py \
		--vertices 12000000 --edges 100000000 --out $(SCALING_GRAPH)
	$(PY) tools/bench_multijvm.py --graph $(SCALING_GRAPH) --repeats 3 \
		--min-edges 90000000 --local-dir-base /dev/shm \
		> BENCH/multijvm.json.tmp && mv BENCH/multijvm.json.tmp BENCH/multijvm.json

membw:
	$(PY) tools/bench_membw.py --workers 2 8 32 --rounds 8 > BENCH/membw.json

# hub-skew stress A/B: salted vs unsalted adjacency-block PageRank on a
# manufactured 2*10^5 x-average hub (see tools/bench_skew.py). ~15 min.
skew:
	$(PY) tools/bench_skew.py --repeats 3 \
		> BENCH/skew.json.tmp && mv BENCH/skew.json.tmp BENCH/skew.json

scaling-fresh:
	$(PY) tools/check_scaling_fresh.py

check: scaling-fresh test
