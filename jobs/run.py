"""spark-submit entry point for the link-graph engine.

Usage (the north rule's deployment shape):

    spark-submit --py-files dist/ega_spark.zip jobs/run.py <command> [opts]

Commands:
    generate   --n 10000 --out /path/pages            synthesize pages parquet
    extract    --pages /path/pages --out /path/graph  pages → url_dict + edges + degrees
    pagerank   --graph /path/graph [--alpha .85 --tol 1e-6 --checkpoint DIR --resume --top 10 --warm RANKS]
    components --graph /path/graph [--checkpoint DIR --resume]
    lpa        --graph /path/graph [--max-iter 20]
    triangles  --graph /path/graph
    hits       --graph /path/graph [--max-iter 30 --tol 1e-8 --top 10]
    salsa      --graph /path/graph [--max-iter 30 --tol 1e-8 --top 10]
    spammass   --graph /path/graph [--seed-mod 50 --max-iter 100 --tol 1e-6]
    hostgraph  --graph /path/graph [--keep-self-loops] [--top 10] [--out DIR]
    kcore      --graph /path/graph --k 3 [--max-iter 100] [--out DIR]
    ktruss     --graph /path/graph --k 4 [--max-iter 100] [--out DIR]
    anf        --graph /path/graph [--max-radius 16 --mode sketch|exact] [--out DIR]
    scc        --graph /path/graph [--out DIR]
    bowtie     --graph /path/graph [--out DIR]
    walks      --graph /path/graph [--length 10 --per-vertex 1 --biased] [--out DIR]
    betweenness --graph /path/graph [--max-radius 3 --sample-mod N] [--out DIR]
    modularity --graph /path/graph [--labels DIR --label-col label] [--top 5] [--out DIR]
    frontier   --graph /path/graph [--shards 64] [--out DIR]
    sssp       --graph /path/graph [--sources-mod 400 --weights hash|unit --max-iter 100] [--out DIR]
    stats      --graph /path/graph [--out DIR]
    cocite     --graph /path/graph [--k 20 --mode cocitation|coupling --cap 256] [--out DIR]
    closeness  --graph /path/graph [--max-radius 3 --sample-mod N] [--out DIR]
    dedup      --docs /path/documents.parquet [--method minhash|exact|simhash|ngram] [--clusters] [--out DIR]
    mirror     --docs /path/documents.parquet [--min-shared 2 --key source] [--out DIR]
    sample     --docs /path/documents.parquet [--rate R --by-lang en=0.5,de=0.25 --qmin Q] [--out DIR]
    decontam   --docs /path/documents.parquet --probes /path/probes.parquet [--width 6] [--out DIR]
    pii        --docs /path/documents.parquet [--redact] [--out DIR]
    repetition --docs /path/documents.parquet [--out DIR]
    boilerplate --docs /path/documents.parquet [--min-count 3] [--out DIR]
    dupspans   --docs /path/documents.parquet [--width 8 --min-count 2] [--out DIR]
    shards     --docs /path/documents.parquet [--shard-tokens N] [--out DIR]
    lmscore    --docs /path/documents.parquet [--k 0.1] [--out DIR]
    cms        --docs /path/documents.parquet [--depth 4 --width 65536 --min-count 100] [--out DIR]
    hashvec    --docs /path/documents.parquet [--dim 262144 --unsigned] [--out DIR]
    bloom      --keys /path/old_urls --probes /path/new_urls [--key-col url --m-bits N --hashes 4] [--out DIR]
    redirects  --map /path/redirects.parquet [--rounds N] [--out DIR]
    robots     --robots /path/robots.parquet --urls /path/urls.parquet [--agent NAME] [--out DIR]
    sitemaps   --sitemaps /path/sitemaps.parquet [--out DIR]
    imghash    --media /path/media.parquet [--pairs --max-hamming 6] [--out DIR]
    audiohash  --media /path/media.parquet [--pairs --max-hamming 8] [--out DIR]
    vidhash    --media /path/media.parquet [--every-n 30 --pairs --min-shared 2] [--out DIR]
    pca        --embeddings /path/embeddings.parquet [--k 8 --no-center] [--out DIR]
    semdedup   --embeddings /path/embeddings.parquet [--threshold T --centroids C] [--out DIR]
    knn        --embeddings /path/embeddings.parquet [--k 5] [--method lsh|exact] [--out DIR]
    sessionize --events /path/events.parquet [--gap-sec 1800] [--out DIR]

(Authoritative list: the argparse subparsers below; each command prints
ONE JSON result line on stdout, Spark logs go to stderr.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from efficient_graph_algorithms_spark.session import get_spark  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ega-spark", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--n", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--out", required=True)

    e = sub.add_parser("extract")
    e.add_argument("--pages", required=True)
    e.add_argument("--out", required=True)

    for name in ("pagerank", "components", "lpa", "triangles", "hits", "salsa",
                 "spammass", "hostgraph",
                 "kcore", "ktruss", "anf", "scc", "walks", "stats", "cocite",
                 "closeness", "bowtie", "betweenness", "linkpred", "localcc",
                 "mis", "diff", "modularity", "frontier", "sssp"):
        p = sub.add_parser(name)
        p.add_argument("--graph", required=True)
        p.add_argument("--out")
        p.add_argument("--checkpoint")
        p.add_argument("--resume", action="store_true")
        if name == "pagerank":
            p.add_argument("--alpha", type=float, default=0.85)
            p.add_argument("--tol", type=float, default=1e-6)
            p.add_argument("--top", type=int, default=10)
            # default: deterministic iff --checkpoint given (see operator)
            p.add_argument("--fast", action="store_true", default=None,
                           help="one-job-per-iteration loop (observe-fused "
                                "metrics) even with a durable checkpoint; "
                                "resume then reproduces allclose, not "
                                "bit-identical")
            p.add_argument("--warm",
                           help="parquet of (id, rank) to warm-start from "
                                "(e.g. --out of the previous crawl's run); "
                                "new vertices start at their teleport "
                                "weight, vector renormalized")
        if name in ("lpa", "components"):
            p.add_argument("--max-iter", type=int, default=20)
        if name in ("hits", "salsa"):
            p.add_argument("--max-iter", type=int, default=30)
            p.add_argument("--tol", type=float, default=1e-8)
            p.add_argument("--top", type=int, default=10)
        if name == "spammass":
            p.add_argument("--max-iter", type=int, default=100)
            p.add_argument("--tol", type=float, default=1e-6)
            p.add_argument("--seed-mod", type=int, default=50,
                           help="trusted seeds = vertices with id %% mod == 0")
            p.add_argument("--top", type=int, default=10)
        if name == "hostgraph":
            p.add_argument("--keep-self-loops", action="store_true")
            p.add_argument("--top", type=int, default=10)
        if name in ("kcore", "ktruss"):
            p.add_argument("--k", type=int, default=2 if name == "kcore" else 3)
            p.add_argument("--max-iter", type=int, default=100)
        if name == "walks":
            p.add_argument("--length", type=int, default=10)
            p.add_argument("--per-vertex", type=int, default=1)
            p.add_argument("--seed", type=int, default=42)
            p.add_argument("--paths", action="store_true",
                           help="emit (walk, path array) instead of long form")
            p.add_argument("--biased", action="store_true",
                           help="node2vec second-order bias (integer weights)")
            p.add_argument("--w-return", type=int, default=1)
            p.add_argument("--w-in", type=int, default=4)
            p.add_argument("--w-out", type=int, default=2)
        if name == "anf":
            p.add_argument("--max-radius", type=int, default=16)
            p.add_argument("--mode", default="sketch", choices=["sketch", "exact"])
            p.add_argument("--registers", type=int, default=64)
            p.add_argument("--top", type=int, default=5,
                           help="print the top-N vertices by harmonic centrality")
        if name == "cocite":
            p.add_argument("--mode", default="cocitation",
                           choices=["cocitation", "coupling"])
            p.add_argument("--k", type=int, default=20)
            p.add_argument("--cap", type=int, default=256,
                           help="drop hubs above this degree from pair generation")
            p.add_argument("--min-count", type=int, default=2)
        if name == "closeness":
            p.add_argument("--max-radius", type=int, default=3)
            p.add_argument("--sample-mod", type=int, default=100,
                           help="sources = vertices with id %% mod == 0")
            p.add_argument("--top", type=int, default=5)
        if name == "betweenness":
            p.add_argument("--max-radius", type=int, default=2)
            p.add_argument("--sample-mod", type=int, default=100,
                           help="sources = vertices with id %% mod == 0")
            p.add_argument("--top", type=int, default=5)
        if name == "linkpred":
            p.add_argument("--k", type=int, default=20)
            p.add_argument("--min-common", type=int, default=2)
            p.add_argument("--cap", type=int, default=256,
                           help="drop wedge centers above this degree")
        if name == "mis":
            p.add_argument("--max-rounds", type=int, default=100)
        if name == "sssp":
            p.add_argument("--sources-mod", type=int, default=400,
                           help="seed set = vertices with id %% mod == 0")
            p.add_argument("--max-iter", type=int, default=100)
            p.add_argument("--weights", default="hash", choices=["hash", "unit"],
                           help="hash: w = 1 + (src+dst) %% 5; unit: hop count")
        if name == "frontier":
            p.add_argument("--shards", type=int, default=64,
                           help="number of fetch shards to deal hosts into")
        if name == "modularity":
            p.add_argument("--labels",
                           help="parquet of (id, <label-col>) — e.g. --out of "
                                "lpa or components; default: the host "
                                "partition parsed from the graph's url_dict")
            p.add_argument("--label-col", default=None,
                           help="community column in --labels (default: "
                                "auto-detect label/component/community)")
            p.add_argument("--top", type=int, default=5,
                           help="print the top-N communities by contribution")
        if name == "diff":
            p.add_argument("--graph-new", required=True,
                           help="second snapshot graph dir to diff against")

    d = sub.add_parser("dedup")
    d.add_argument("--docs", required=True)
    d.add_argument("--method", default="minhash",
                   choices=["minhash", "exact", "simhash", "ngram"])
    d.add_argument("--clusters", action="store_true",
                   help="close the pair graph transitively and keep one "
                        "representative per cluster (pair methods only)")
    d.add_argument("--out")

    mi = sub.add_parser("mirror")
    mi.add_argument("--docs", required=True)
    mi.add_argument("--min-shared", type=int, default=2)
    mi.add_argument("--key", default="source",
                    help="grouping column paired by shared fingerprints")
    mi.add_argument("--out")

    sm = sub.add_parser("sample")
    sm.add_argument("--docs", required=True)
    sm.add_argument("--rate", type=float, default=0.1)
    sm.add_argument("--by-lang", default=None,
                    help="per-language rates, e.g. en=0.5,de=0.25 "
                         "(others fall back to --rate)")
    sm.add_argument("--qmin", type=int, default=0,
                    help="drop docs with quality_score below this first")
    sm.add_argument("--seed", type=int, default=42)
    sm.add_argument("--out")

    k = sub.add_parser("knn")
    k.add_argument("--embeddings", required=True)
    k.add_argument("--k", type=int, default=5)
    k.add_argument("--method", default="lsh", choices=["lsh", "exact"])
    k.add_argument("--dim", type=int, help="embedding width (default: inferred)")
    k.add_argument("--out")

    s = sub.add_parser("sessionize")
    s.add_argument("--events", required=True)
    s.add_argument("--gap-sec", type=int, default=1800)
    s.add_argument("--out")

    dc = sub.add_parser("decontam")
    dc.add_argument("--docs", required=True)
    dc.add_argument("--probes", required=True,
                    help="parquet of benchmark rows with a text column")
    dc.add_argument("--width", type=int, default=6,
                    help="words per overlap n-gram")
    dc.add_argument("--out")

    pi = sub.add_parser("pii")
    pi.add_argument("--docs", required=True)
    pi.add_argument("--out")

    rp = sub.add_parser("repetition")
    rp.add_argument("--docs", required=True)
    rp.add_argument("--out")

    bl = sub.add_parser("boilerplate")
    bl.add_argument("--docs", required=True)
    bl.add_argument("--min-count", type=int, default=3)
    bl.add_argument("--out")

    ds = sub.add_parser("dupspans")
    ds.add_argument("--docs", required=True)
    ds.add_argument("--width", type=int, default=8)
    ds.add_argument("--min-count", type=int, default=2)
    ds.add_argument("--out")

    sh = sub.add_parser("shards")
    sh.add_argument("--docs", required=True)
    sh.add_argument("--shard-tokens", type=int, default=1 << 20)
    sh.add_argument("--seed", type=int, default=42)
    sh.add_argument("--out")

    ih = sub.add_parser("imghash")
    ih.add_argument("--media", required=True,
                    help="parquet of (media_id, payload binary) image rows")
    ih.add_argument("--pairs", action="store_true",
                    help="also emit near-dup pairs (banded Hamming join)")
    ih.add_argument("--max-hamming", type=int, default=6)
    ih.add_argument("--out")

    vh = sub.add_parser("vidhash")
    vh.add_argument("--media", required=True,
                    help="parquet of (media_id, payload binary) Y4M rows")
    vh.add_argument("--every-n", type=int, default=30)
    vh.add_argument("--pairs", action="store_true",
                    help="emit near-dup pairs (shared-frame inverted index)")
    vh.add_argument("--min-shared", type=int, default=2)
    vh.add_argument("--hot-cap", type=int, default=64)
    vh.add_argument("--out")

    af = sub.add_parser("audiohash")
    af.add_argument("--media", required=True,
                    help="parquet of (media_id, payload binary) WAV rows")
    af.add_argument("--pairs", action="store_true",
                    help="also emit near-dup pairs (banded Hamming join)")
    af.add_argument("--max-hamming", type=int, default=8)
    af.add_argument("--out")

    bl = sub.add_parser("bloom")
    bl.add_argument("--keys", required=True,
                    help="parquet whose --key-col builds the filter "
                         "(e.g. the previous crawl's url_dict)")
    bl.add_argument("--probes", required=True,
                    help="parquet whose --key-col is membership-tested")
    bl.add_argument("--key-col", default="url")
    bl.add_argument("--m-bits", type=int, default=1 << 24)
    bl.add_argument("--hashes", type=int, default=4)
    bl.add_argument("--out")

    rb = sub.add_parser("robots")
    rb.add_argument("--robots", required=True,
                    help="parquet of (host, robots_txt)")
    rb.add_argument("--urls", required=True,
                    help="parquet of (url, host, path)")
    rb.add_argument("--agent", default="*")
    rb.add_argument("--out")

    sm2 = sub.add_parser("sitemaps")
    sm2.add_argument("--sitemaps", required=True,
                     help="parquet of (host, sitemap_xml)")
    sm2.add_argument("--out")

    rd = sub.add_parser("redirects")
    rd.add_argument("--map", required=True, dest="redirect_map",
                    help="parquet of (id, target) — the crawl's 3xx layer, "
                         "one row per redirecting url")
    rd.add_argument("--rounds", type=int,
                    help="pointer-doubling rounds (default: enough for any "
                         "acyclic chain)")
    rd.add_argument("--out")

    hv = sub.add_parser("hashvec")
    hv.add_argument("--docs", required=True)
    hv.add_argument("--dim", type=int, default=1 << 18)
    hv.add_argument("--unsigned", action="store_true",
                    help="plain collision-summed counts (no sign hash)")
    hv.add_argument("--out")

    cm = sub.add_parser("cms")
    cm.add_argument("--docs", required=True)
    cm.add_argument("--depth", type=int, default=4)
    cm.add_argument("--width", type=int, default=65536)
    cm.add_argument("--min-count", type=int, default=100,
                    help="heavy-hitter threshold on the CMS estimate")
    cm.add_argument("--top", type=int, default=10)
    cm.add_argument("--out")

    lm = sub.add_parser("lmscore")
    lm.add_argument("--docs", required=True)
    lm.add_argument("--k", type=float, default=0.1)
    lm.add_argument("--out")

    bm = sub.add_parser("bm25")
    bm.add_argument("--docs", required=True)
    bm.add_argument("--terms", required=True,
                    help="comma-separated query terms")
    bm.add_argument("--k", type=int, default=20)
    bm.add_argument("--out")

    nb = sub.add_parser("nbscore")
    nb.add_argument("--docs", required=True)
    nb.add_argument("--labeled", required=True,
                    help="parquet with (doc_id, text, label 0/1)")
    nb.add_argument("--alpha", type=float, default=1.0)
    nb.add_argument("--out")

    an = sub.add_parser("anchors")
    an.add_argument("--pages", required=True)
    an.add_argument("--top", type=int, default=10)
    an.add_argument("--out", help="write (dst_url, term, n) parquet")

    qz = sub.add_parser("quantize")
    qz.add_argument("--embeddings", required=True)
    qz.add_argument("--out", help="write (id, codes array<int>) parquet")

    pc = sub.add_parser("pca")
    pc.add_argument("--embeddings", required=True)
    pc.add_argument("--k", type=int, default=8)
    pc.add_argument("--no-center", action="store_true")
    pc.add_argument("--out", help="write projected vectors parquet")

    sd = sub.add_parser("semdedup")
    sd.add_argument("--embeddings", required=True)
    sd.add_argument("--threshold", type=float, default=0.95)
    sd.add_argument("--centroids", type=int, default=16,
                    help="coarse clusters (1 = exhaustive brute force)")
    sd.add_argument("--seed", type=int, default=42)
    sd.add_argument("--out")

    args = ap.parse_args(argv)
    spark = get_spark(f"ega-{args.cmd}")
    t0 = time.time()

    if args.cmd == "generate":
        from efficient_graph_algorithms_spark.sources.pages import pages_df

        pages_df(spark, args.n, seed=args.seed).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"cmd": "generate", "n": args.n, "out": args.out,
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "extract":
        from efficient_graph_algorithms_spark.sources.edges import (
            adjacency_blocks, build_edges, out_degrees)

        pages = spark.read.parquet(args.pages)
        url_dict, edges = build_edges(pages)
        url_dict.write.mode("overwrite").parquet(f"{args.out}/url_dict")
        edges.write.mode("overwrite").parquet(f"{args.out}/edges")
        edges = spark.read.parquet(f"{args.out}/edges")
        out_degrees(edges).write.mode("overwrite").parquet(f"{args.out}/degrees")
        adjacency_blocks(edges).write.mode("overwrite").parquet(f"{args.out}/adjacency")
        n_edges = edges.count()
        n_verts = spark.read.parquet(f"{args.out}/url_dict").count()
        print(json.dumps({"cmd": "extract", "vertices": n_verts, "edges": n_edges,
                          "out": args.out, "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "dedup":
        from efficient_graph_algorithms_spark.operators.dedup import (
            exact_duplicates, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs)

        docs = spark.read.parquet(args.docs)
        fn = {"minhash": minhash_lsh_pairs, "exact": exact_duplicates,
              "simhash": simhash_pairs, "ngram": ngram_jaccard_pairs}[args.method]
        pairs = fn(docs)
        if args.clusters:
            if args.method == "exact":
                raise SystemExit("--clusters needs a pair method "
                                 "(minhash/simhash/ngram); exact already "
                                 "yields one keep_id per group")
            from efficient_graph_algorithms_spark.operators.dedup import (
                dedup_clusters)

            labeled = dedup_clusters(spark, docs, pairs=pairs)
            if args.out:
                labeled.write.mode("overwrite").parquet(args.out)
                labeled = spark.read.parquet(args.out)
            kept = labeled.agg(F.sum("keep").alias("k"),
                               F.count("*").alias("n")).first()
            print(json.dumps({"cmd": "dedup", "method": args.method,
                              "clusters": True, "docs": int(kept["n"]),
                              "kept": int(kept["k"]),
                              "removed": int(kept["n"] - kept["k"]),
                              "sec": round(time.time() - t0, 2)}))
            return 0
        if args.out:
            pairs.write.mode("overwrite").parquet(args.out)
            pairs = spark.read.parquet(args.out)
        print(json.dumps({"cmd": "dedup", "method": args.method,
                          "docs": docs.count(), "pairs": pairs.count(),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "mirror":
        from efficient_graph_algorithms_spark.operators.cocite import mirror_pairs

        docs = spark.read.parquet(args.docs)
        pairs = mirror_pairs(docs, min_shared=args.min_shared, key_col=args.key)
        if args.out:
            pairs.write.mode("overwrite").parquet(args.out)
            pairs = spark.read.parquet(args.out)
        top = [
            (r["a"], r["b"], r["n_common"])
            for r in pairs.orderBy(F.desc("n_common"), "a", "b").limit(5).collect()
        ]
        print(json.dumps({"cmd": "mirror", "min_shared": args.min_shared,
                          "n_pairs": pairs.count(), "top": top,
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "sample":
        from efficient_graph_algorithms_spark.functions.text import quality_score
        from efficient_graph_algorithms_spark.operators.sampling import (
            hash_sample, stratified_sample)

        docs = spark.read.parquet(args.docs)
        n_in = docs.count()
        if args.qmin > 0:
            docs = docs.where(quality_score(F.col("text")) >= args.qmin)
        if args.by_lang:
            rates = {}
            for kv in args.by_lang.split(","):
                key, sep, val = kv.partition("=")
                if not sep or not key:
                    raise SystemExit(
                        f"sample: bad --by-lang entry {kv!r} "
                        "(expected lang=rate, e.g. en=0.5,de=0.25)"
                    )
                rates[key] = float(val)
            out = stratified_sample(docs, rates, default_rate=args.rate,
                                    seed=args.seed)
        else:
            out = hash_sample(docs, args.rate, seed=args.seed)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        print(json.dumps({"cmd": "sample", "rate": args.rate,
                          "by_lang": args.by_lang, "qmin": args.qmin,
                          "docs_in": n_in, "docs_kept": out.count(),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "decontam":
        from efficient_graph_algorithms_spark.operators.decontam import decontaminate

        docs = spark.read.parquet(args.docs)
        probes = spark.read.parquet(args.probes)
        hits = decontaminate(docs, probes, width=args.width)
        if args.out:
            hits.write.mode("overwrite").parquet(args.out)
            hits = spark.read.parquet(args.out)
        print(json.dumps({"cmd": "decontam", "width": args.width,
                          "docs": docs.count(), "flagged": hits.count(),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "pii":
        from efficient_graph_algorithms_spark.operators.pii import pii_features

        docs = spark.read.parquet(args.docs)
        out = pii_features(docs)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i"),
                      F.sum((F.col("n_emails") + F.col("n_ips") > 0).cast("long")
                            ).alias("d")).first()
        print(json.dumps({"cmd": "pii", "docs": out.count(),
                          "docs_with_pii": int(agg["d"] or 0),
                          "emails": int(agg["e"] or 0), "ips": int(agg["i"] or 0),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "repetition":
        from efficient_graph_algorithms_spark.operators.repetition import (
            repetition_features)

        docs = spark.read.parquet(args.docs)
        out = repetition_features(docs)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.count("*").alias("n"),
                      F.avg("dup_token_frac").alias("ad"),
                      F.avg("top_bigram_frac").alias("ab")).first()
        print(json.dumps({"cmd": "repetition", "docs": int(agg["n"]),
                          "avg_dup_token_frac": round(float(agg["ad"] or 0), 6),
                          "avg_top_bigram_frac": round(float(agg["ab"] or 0), 6),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "boilerplate":
        from efficient_graph_algorithms_spark.operators.boilerplate import (
            remove_boilerplate_lines)

        docs = spark.read.parquet(args.docs)
        out = remove_boilerplate_lines(docs, min_count=args.min_count)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.count("*").alias("n"),
                      F.sum("n_lines").alias("nl"),
                      F.sum("n_removed").alias("nr")).first()
        print(json.dumps({"cmd": "boilerplate", "min_count": args.min_count,
                          "docs": int(agg["n"]), "lines": int(agg["nl"] or 0),
                          "lines_removed": int(agg["nr"] or 0),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "dupspans":
        from efficient_graph_algorithms_spark.operators.dupspans import dup_span_stats

        docs = spark.read.parquet(args.docs)
        out = dup_span_stats(docs, width=args.width, min_count=args.min_count)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.count("*").alias("n"),
                      F.sum("n_windows").alias("nw"),
                      F.sum("n_dup_windows").alias("ndw")).first()
        nw, ndw = int(agg["nw"] or 0), int(agg["ndw"] or 0)
        print(json.dumps({"cmd": "dupspans", "width": args.width,
                          "min_count": args.min_count, "docs": int(agg["n"]),
                          "windows": nw, "dup_windows": ndw,
                          "corpus_dup_frac": round(ndw / nw, 6) if nw else 0.0,
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "shards":
        from efficient_graph_algorithms_spark.operators.sampling import assign_shards

        docs = spark.read.parquet(args.docs)
        out = assign_shards(docs, shard_tokens=args.shard_tokens, seed=args.seed)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.count("*").alias("n"), F.sum("n_tok").alias("t"),
                      (F.max("shard_id") + 1).alias("s")).first()
        print(json.dumps({"cmd": "shards", "shard_tokens": args.shard_tokens,
                          "docs": int(agg["n"]), "tokens": int(agg["t"] or 0),
                          "shards": int(agg["s"] or 0),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "vidhash":
        from efficient_graph_algorithms_spark.operators.imagehash import (
            video_frame_dhashes, video_near_dups)

        media = spark.read.parquet(args.media)
        out = {"cmd": "vidhash", "every_n": args.every_n}
        if args.pairs:
            pairs = video_near_dups(media, every_n=args.every_n,
                                    min_shared=args.min_shared,
                                    hot_cap=args.hot_cap)
            if args.out:
                pairs.write.mode("overwrite").parquet(args.out)
                pairs = spark.read.parquet(args.out)
            out["pairs"] = pairs.count()
            out["min_shared"] = args.min_shared
        else:
            fp = video_frame_dhashes(media, every_n=args.every_n)
            if args.out:
                fp.write.mode("overwrite").parquet(args.out)
                fp = spark.read.parquet(args.out)
            out["frames_hashed"] = fp.count()
            out["videos"] = fp.select("media_id").distinct().count()
        out["sec"] = round(time.time() - t0, 2)
        print(json.dumps(out))
        return 0

    if args.cmd == "audiohash":
        from efficient_graph_algorithms_spark.operators.audiohash import (
            audio_afps, audio_near_dups)

        media = spark.read.parquet(args.media)
        out = {"cmd": "audiohash"}
        if args.pairs:
            pairs = audio_near_dups(media, max_hamming=args.max_hamming)
            if args.out:
                pairs.write.mode("overwrite").parquet(args.out)
                pairs = spark.read.parquet(args.out)
            out["pairs"] = pairs.count()
            out["max_hamming"] = args.max_hamming
        else:
            hashes = audio_afps(media)
            if args.out:
                hashes.write.mode("overwrite").parquet(args.out)
                hashes = spark.read.parquet(args.out)
            out["hashed"] = hashes.count()
            out["distinct_hashes"] = hashes.select("afp").distinct().count()
        out["sec"] = round(time.time() - t0, 2)
        print(json.dumps(out))
        return 0

    if args.cmd == "imghash":
        from efficient_graph_algorithms_spark.operators.imagehash import (
            image_dhashes, image_near_dups)

        media = spark.read.parquet(args.media)
        out = {"cmd": "imghash"}
        if args.pairs:
            pairs = image_near_dups(media, max_hamming=args.max_hamming)
            if args.out:
                pairs.write.mode("overwrite").parquet(args.out)
                pairs = spark.read.parquet(args.out)
            out["pairs"] = pairs.count()
            out["max_hamming"] = args.max_hamming
        else:
            hashes = image_dhashes(media)
            if args.out:
                hashes.write.mode("overwrite").parquet(args.out)
                hashes = spark.read.parquet(args.out)
            out["hashed"] = hashes.count()
            out["distinct_hashes"] = hashes.select("dhash").distinct().count()
        out["sec"] = round(time.time() - t0, 2)
        print(json.dumps(out))
        return 0

    if args.cmd == "bloom":
        from efficient_graph_algorithms_spark.operators.bloom import (
            bloom_build, bloom_contains)

        keys = spark.read.parquet(args.keys)
        probes = spark.read.parquet(args.probes)
        bloom = bloom_build(keys, key_col=args.key_col, m_bits=args.m_bits,
                            n_hashes=args.hashes).persist()
        verdicts = bloom_contains(probes, bloom, key_col=args.key_col,
                                  m_bits=args.m_bits, n_hashes=args.hashes)
        if args.out:
            verdicts.write.mode("overwrite").parquet(args.out)
            verdicts = spark.read.parquet(args.out)
        agg = verdicts.agg(
            F.count("*").alias("n"),
            F.sum(F.col("maybe_member").cast("int")).alias("hits")).first()
        n_bits = bloom.count()
        bloom.unpersist()
        print(json.dumps({
            "cmd": "bloom", "m_bits": args.m_bits, "hashes": args.hashes,
            "set_bits": n_bits, "probes": int(agg["n"] or 0),
            "maybe_members": int(agg["hits"] or 0),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "robots":
        from efficient_graph_algorithms_spark.operators.robots import (
            parse_robots, robots_directives, robots_filter)

        robots_df = spark.read.parquet(args.robots)
        rules = parse_robots(robots_df, user_agent=args.agent).persist()
        n_rules = rules.count()
        dirs = robots_directives(robots_df, user_agent=args.agent).agg(
            F.count(F.col("crawl_delay")).alias("delay_hosts"),
            F.max("crawl_delay").alias("max_delay"),
            F.sum(F.size(F.coalesce(F.col("sitemaps"), F.array())))
            .alias("sitemaps")).first()
        out = robots_filter(spark.read.parquet(args.urls), rules)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum("allowed").alias("ok"),
            F.countDistinct(F.when(F.col("allowed") == 0, F.col("host")))
            .alias("blocking_hosts")).first()
        rules.unpersist()
        print(json.dumps({
            "cmd": "robots", "agent": args.agent, "rules": n_rules,
            "urls": int(agg["n"] or 0), "allowed": int(agg["ok"] or 0),
            "disallowed": int((agg["n"] or 0) - (agg["ok"] or 0)),
            "blocking_hosts": int(agg["blocking_hosts"] or 0),
            "crawl_delay_hosts": int(dirs["delay_hosts"] or 0),
            "max_crawl_delay": (None if dirs["max_delay"] is None
                                else float(dirs["max_delay"])),
            "sitemap_urls": int(dirs["sitemaps"] or 0),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "sitemaps":
        from efficient_graph_algorithms_spark.operators.sitemaps import (
            parse_sitemaps)

        out = parse_sitemaps(spark.read.parquet(args.sitemaps))
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum((F.col("kind") == "url").cast("int")).alias("n_urls"),
            F.sum((F.col("kind") == "sitemap").cast("int")).alias("n_children"),
            F.sum(F.col("lastmod").isNotNull().cast("int")).alias("n_lastmod"),
            F.countDistinct("host").alias("hosts")).first()
        print(json.dumps({
            "cmd": "sitemaps", "entries": int(agg["n"] or 0),
            "page_urls": int(agg["n_urls"] or 0),
            "child_sitemaps": int(agg["n_children"] or 0),
            "with_lastmod": int(agg["n_lastmod"] or 0),
            "hosts": int(agg["hosts"] or 0),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "redirects":
        from efficient_graph_algorithms_spark.operators.redirects import (
            resolve_redirects)

        rmap = spark.read.parquet(args.redirect_map)
        out, info = resolve_redirects(spark, rmap, rounds=args.rounds)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("resolved")).alias("res"),
            F.max(F.when(F.col("resolved") == 1, F.col("hops"))).alias("mx"),
            F.avg(F.when(F.col("resolved") == 1, F.col("hops"))).alias("avg"),
        ).first()
        print(json.dumps({
            "cmd": "redirects", "sources": int(agg["n"] or 0),
            "resolved": int(agg["res"] or 0),
            "unresolved": info["n_unresolved"],
            "rounds_run": info["rounds_run"],
            "max_chain": int(agg["mx"] or 0),
            "avg_chain": round(float(agg["avg"] or 0), 4),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "hashvec":
        from efficient_graph_algorithms_spark.operators.hashvec import (
            hashed_feature_norms, hashed_features)

        docs = spark.read.parquet(args.docs)
        feats = hashed_features(docs, dim=args.dim, signed=not args.unsigned)
        if args.out:
            feats.write.mode("overwrite").parquet(args.out)
            feats = spark.read.parquet(args.out)
        agg = hashed_feature_norms(feats).agg(
            F.count("*").alias("docs"), F.sum("nnz").alias("entries"),
            F.avg("nnz").alias("avg_nnz"), F.sum("sq_norm").alias("mass")).first()
        print(json.dumps({
            "cmd": "hashvec", "dim": args.dim, "signed": not args.unsigned,
            "docs": int(agg["docs"] or 0), "entries": int(agg["entries"] or 0),
            "avg_nnz": round(float(agg["avg_nnz"] or 0), 2),
            "total_sq_mass": int(agg["mass"] or 0),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "cms":
        from efficient_graph_algorithms_spark.operators.cms import (
            cms_build, cms_heavy_hitters)

        docs = spark.read.parquet(args.docs)
        sketch = cms_build(docs, depth=args.depth, width=args.width).persist()
        hh = cms_heavy_hitters(docs, sketch, args.min_count, width=args.width)
        if args.out:
            hh.write.mode("overwrite").parquet(args.out)
            hh = spark.read.parquet(args.out)
        rows = hh.orderBy(F.desc("exact"), F.asc("term")).limit(args.top).collect()
        n_hh = hh.count()
        over = hh.agg(F.sum(F.col("estimate") - F.col("exact"))).first()[0]
        sketch.unpersist()
        print(json.dumps({
            "cmd": "cms", "depth": args.depth, "width": args.width,
            "min_count": args.min_count, "heavy_hitters": n_hh,
            "total_overcount": int(over or 0),
            "top": [{"term": r["term"], "estimate": r["estimate"],
                     "exact": r["exact"]} for r in rows],
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "lmscore":
        from efficient_graph_algorithms_spark.operators.lm import (
            score_perplexity, train_bigram_lm)

        docs = spark.read.parquet(args.docs)
        c2, c1, vocab = train_bigram_lm(docs)
        out = score_perplexity(docs, c2, c1, vocab, k=args.k)
        ppl = out.where(F.col("n_bigrams") > 0).select(
            F.exp(-F.col("sum_logp") / F.col("n_bigrams")).alias("ppl"))
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
        agg = ppl.agg(F.count("*").alias("n"), F.avg("ppl").alias("avg"),
                      F.expr("percentile_approx(ppl, 0.5)").alias("med")).first()
        print(json.dumps({"cmd": "lmscore", "k": args.k, "vocab": vocab,
                          "docs_scored": int(agg["n"]),
                          "avg_ppl": round(float(agg["avg"] or 0), 2),
                          "median_ppl": round(float(agg["med"] or 0), 2),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "bm25":
        from efficient_graph_algorithms_spark.operators.bm25 import bm25_topk

        docs = spark.read.parquet(args.docs)
        terms = [t for t in args.terms.split(",") if t.strip()]
        out = bm25_topk(docs, terms, k=args.k)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        rows = sorted(((r["doc_id"], r["n_terms"], r["score"])
                       for r in out.collect()),
                      key=lambda r: (-r[2], r[0]))
        print(json.dumps({
            "cmd": "bm25", "terms": sorted({t.lower() for t in terms}),
            "k": args.k,
            "top": [{"doc_id": d, "n_terms": n, "score": s}
                    for d, n, s in rows],
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "nbscore":
        from efficient_graph_algorithms_spark.operators.classifier import (
            nb_classify)

        docs = spark.read.parquet(args.docs)
        labeled = spark.read.parquet(args.labeled)
        out = nb_classify(labeled, docs, alpha=args.alpha)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.count("*").alias("n"),
                      F.sum("pred").alias("n_pos"),
                      F.avg("llr").alias("avg_llr")).first()
        print(json.dumps({
            "cmd": "nbscore", "alpha": args.alpha,
            "docs_scored": int(agg["n"]), "n_positive": int(agg["n_pos"]),
            "avg_llr": round(float(agg["avg_llr"] or 0), 6),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "anchors":
        from efficient_graph_algorithms_spark.sources.edges import (
            anchor_term_counts)

        pages = spark.read.parquet(args.pages)
        out = anchor_term_counts(pages)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        top = (out.groupBy("term").agg(F.sum("n").alias("n"))
               .orderBy(F.desc("n"), F.asc("term")).limit(args.top).collect())
        n_pairs = out.count()
        print(json.dumps({
            "cmd": "anchors", "target_term_pairs": n_pairs,
            "top_terms": [{"term": r["term"], "n": r["n"]} for r in top],
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "quantize":
        from efficient_graph_algorithms_spark.operators.quantize import (
            collect_scales, encode_int8, fit_absmax_scales,
            quantization_report)

        emb = spark.read.parquet(args.embeddings)
        svec = collect_scales(fit_absmax_scales(emb))
        if args.out:
            encode_int8(emb, svec).write.mode("overwrite").parquet(args.out)
        # decimals=12: CLI wants resolution; the driver query keeps the
        # cross-engine round-6 contract
        agg = quantization_report(emb, svec, decimals=12).agg(
            F.count("*").alias("n"), F.avg("mse").alias("avg_mse"),
            F.max("mse").alias("max_mse")).first()
        print(json.dumps({
            "cmd": "quantize", "dims": len(svec),
            "vectors": int(agg["n"]),
            "avg_mse": round(float(agg["avg_mse"] or 0), 8),
            "max_mse": round(float(agg["max_mse"] or 0), 8),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "pca":
        from efficient_graph_algorithms_spark.operators.pca import pca_fit, project

        emb = spark.read.parquet(args.embeddings)
        model = pca_fit(emb, k=args.k, center=not args.no_center)
        if args.out:
            project(emb, model).write.mode("overwrite").parquet(args.out)
        evr = [round(float(v), 6) for v in model["explained_variance_ratio"]]
        print(json.dumps({"cmd": "pca", "k": args.k, "n": model["n"],
                          "centered": not args.no_center,
                          "explained_variance_ratio": evr,
                          "cum_evr": round(float(sum(evr)), 6),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "semdedup":
        from efficient_graph_algorithms_spark.operators.similarity import (
            semantic_dedup)

        emb = spark.read.parquet(args.embeddings)
        out = semantic_dedup(emb, threshold=args.threshold,
                             n_centroids=args.centroids, seed=args.seed)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.count("*").alias("n"), F.sum("keep").alias("k")).first()
        print(json.dumps({"cmd": "semdedup", "threshold": args.threshold,
                          "centroids": args.centroids, "vectors": int(agg["n"]),
                          "kept": int(agg["k"] or 0),
                          "removed": int(agg["n"] - (agg["k"] or 0)),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "sessionize":
        from efficient_graph_algorithms_spark.streaming.sessions import sessionize

        events = spark.read.parquet(args.events)
        sess = sessionize(events, gap_sec=args.gap_sec)
        if args.out:
            sess.write.mode("overwrite").parquet(args.out)
            sess = spark.read.parquet(args.out)
        stats = sess.agg(
            F.count("*").alias("sessions"),
            F.max("n_events").alias("max_events"),
        ).collect()[0]
        print(json.dumps({"cmd": "sessionize", "gap_sec": args.gap_sec,
                          "events": events.count(),
                          "sessions": stats["sessions"],
                          "max_events": stats["max_events"],
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "knn":
        from efficient_graph_algorithms_spark.operators.ann import knn_graph

        points = spark.read.parquet(args.embeddings)
        # LSH planes must match the embedding width: zip_with null-pads a
        # mismatch and every vector would silently hash to bucket 0.
        # exact mode never uses dim — skip the inference job entirely
        dim = args.dim
        if not dim and args.method != "exact":
            first = points.select("embedding").first()
            if first is None or first[0] is None:
                raise SystemExit(
                    "knn: cannot infer --dim from an empty embeddings table; "
                    "pass --dim explicitly"
                )
            dim = len(first[0])
        g = knn_graph(points, k=args.k, method=args.method, dim=dim)
        if args.out:
            g.write.mode("overwrite").parquet(args.out)
            g = spark.read.parquet(args.out)
        print(json.dumps({"cmd": "knn", "method": args.method, "k": args.k,
                          "points": points.count(), "edges": g.count(),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    edges = spark.read.parquet(f"{args.graph}/edges")
    vertices = spark.read.parquet(f"{args.graph}/url_dict").select(F.col("id"))

    if args.cmd == "pagerank":
        from efficient_graph_algorithms_spark.operators.pagerank import pagerank, top_k

        warm = spark.read.parquet(args.warm).select("id", "rank") if args.warm else None
        ranks, info = pagerank(
            spark, edges, vertices=vertices, alpha=args.alpha, tol=args.tol,
            checkpoint_dir=args.checkpoint, resume=args.resume,
            deterministic=(None if args.fast is None else not args.fast),
            init_ranks=warm,
        )
        if args.out:
            ranks.write.mode("overwrite").parquet(args.out)
        top = top_k(ranks, args.top).join(
            spark.read.parquet(f"{args.graph}/url_dict"), "id"
        ).orderBy(F.desc("rank")).collect()
        print(json.dumps({
            "cmd": "pagerank", "n": info["n"], "iterations": info["iterations"],
            "converged": info["converged"], "final_delta": info["deltas"][-1] if info["deltas"] else None,
            "sec": round(time.time() - t0, 2),
            "top": [{"id": r["id"], "url": r["url"], "rank": r["rank"]} for r in top],
        }))
        return 0

    if args.cmd == "components":
        from efficient_graph_algorithms_spark.operators.components import connected_components

        labels, info = connected_components(
            spark, edges, vertices=vertices, max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint, resume=args.resume,
        )
        if args.out:
            labels.write.mode("overwrite").parquet(args.out)
        n_comp = labels.select("component").distinct().count()
        print(json.dumps({"cmd": "components", "rounds": info["rounds"],
                          "components": n_comp, "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "lpa":
        from efficient_graph_algorithms_spark.operators.lpa import label_propagation

        labels, info = label_propagation(
            spark, edges, vertices=vertices, max_iter=args.max_iter,
            checkpoint_dir=args.checkpoint, resume=args.resume,
        )
        if args.out:
            labels.write.mode("overwrite").parquet(args.out)
        n_lab = labels.select("label").distinct().count()
        print(json.dumps({"cmd": "lpa", "rounds": info["rounds"], "labels": n_lab,
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "hits":
        from efficient_graph_algorithms_spark.operators.hits import hits

        scores, info = hits(spark, edges, vertices=vertices,
                            max_iter=args.max_iter, tol=args.tol)
        if args.out:
            scores.write.mode("overwrite").parquet(args.out)
        url_dict = spark.read.parquet(f"{args.graph}/url_dict")
        top = (scores.orderBy(F.desc("authority"), F.asc("id")).limit(args.top)
               .join(url_dict, "id")
               .orderBy(F.desc("authority"), F.asc("id")).collect())
        print(json.dumps({
            "cmd": "hits", "n": info["n"], "iterations": info["iterations"],
            "converged": info["converged"], "sec": round(time.time() - t0, 2),
            "top_authorities": [{"id": r["id"], "url": r["url"],
                                 "authority": r["authority"], "hub": r["hub"]}
                                for r in top],
        }))
        return 0

    if args.cmd == "salsa":
        from efficient_graph_algorithms_spark.operators.hits import salsa

        scores, info = salsa(spark, edges, vertices=vertices,
                             max_iter=args.max_iter, tol=args.tol)
        if args.out:
            scores.write.mode("overwrite").parquet(args.out)
        url_dict = spark.read.parquet(f"{args.graph}/url_dict")
        top = (scores.orderBy(F.desc("authority"), F.asc("id")).limit(args.top)
               .join(url_dict, "id")
               .orderBy(F.desc("authority"), F.asc("id")).collect())
        print(json.dumps({
            "cmd": "salsa", "n": info["n"], "iterations": info["iterations"],
            "converged": info["converged"], "sec": round(time.time() - t0, 2),
            "top_authorities": [{"id": r["id"], "url": r["url"],
                                 "authority": r["authority"], "hub": r["hub"]}
                                for r in top],
        }))
        return 0

    if args.cmd == "spammass":
        from efficient_graph_algorithms_spark.operators.trustrank import spam_mass

        seeds = vertices.where(F.col("id") % args.seed_mod == 0)
        out, info = spam_mass(spark, edges, seeds, vertices=vertices,
                              max_iter=args.max_iter, tol=args.tol)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        url_dict = spark.read.parquet(f"{args.graph}/url_dict")
        top = (out.orderBy(F.desc("spam_mass"), F.asc("id")).limit(args.top)
               .join(url_dict, "id")
               .orderBy(F.desc("spam_mass"), F.asc("id")).collect())
        print(json.dumps({
            "cmd": "spammass", "n": info["pagerank"]["n"],
            "seed_mod": args.seed_mod,
            "pr_iterations": info["pagerank"]["iterations"],
            "tr_iterations": info["trustrank"]["iterations"],
            "sec": round(time.time() - t0, 2),
            "top_spam_mass": [{"id": r["id"], "url": r["url"],
                               "spam_mass": round(r["spam_mass"], 6)}
                              for r in top],
        }))
        return 0

    if args.cmd == "kcore":
        from efficient_graph_algorithms_spark.operators.kcore import k_core

        core, info = k_core(spark, edges, args.k, max_iter=args.max_iter)
        if args.out:
            core.write.mode("overwrite").parquet(args.out)
        print(json.dumps({
            "cmd": "kcore", "k": args.k, "rounds": info["rounds"],
            "converged": info["converged"], "core_vertices": core.count(),
            "core_edges": info["core_edges"] // 2,
            "sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.cmd == "stats":
        from efficient_graph_algorithms_spark.operators.webstats import (
            degree_powerlaw, web_stats)

        stats, info = web_stats(spark, edges)
        if args.out:
            stats.write.mode("overwrite").parquet(args.out)
            stats = spark.read.parquet(args.out)
        row = stats.first()
        pl = degree_powerlaw(edges, xmin=2).first()
        print(json.dumps({
            "cmd": "stats", "reciprocity": row["reciprocity"],
            "assortativity": row["assortativity"],
            "clustering": row["clustering"], **info,
            "powerlaw_alpha": pl["alpha"], "powerlaw_tail": pl["n_tail"],
            "sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.cmd == "linkpred":
        from efficient_graph_algorithms_spark.operators.linkpred import (
            link_prediction_topk)

        out, info = link_prediction_topk(edges, k=args.k,
                                         min_common=args.min_common,
                                         degree_cap=args.cap)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        rows = sorted(
            ((r["a"], r["b"], r["n_common"], r["aa"], r["jaccard"])
             for r in out.collect()),
            key=lambda r: (-r[3], r[0], r[1]))
        print(json.dumps({
            "cmd": "linkpred", "k": args.k, "cap": args.cap,
            "n_capped_centers": info["n_capped_centers"],
            "predictions": [{"a": a, "b": b, "n_common": n, "aa": aa,
                             "jaccard": j} for a, b, n, aa, j in rows],
            "sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.cmd == "localcc":
        from efficient_graph_algorithms_spark.operators.linkpred import (
            local_clustering)

        out = local_clustering(edges)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.agg(F.count("*").alias("n"),
                      F.avg("lcc").alias("mean_lcc"),
                      F.sum("triangles").alias("tri3")).first()
        print(json.dumps({
            "cmd": "localcc", "n_vertices": agg["n"],
            "mean_lcc": round(agg["mean_lcc"], 9),
            "triangle_memberships": agg["tri3"],
            "sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.cmd == "diff":
        from efficient_graph_algorithms_spark.operators.snapshot import (
            snapshot_diff, snapshot_diff_summary)

        edges_new = spark.read.parquet(f"{args.graph_new}/edges")
        _, vertex_diff = snapshot_diff(edges, edges_new)
        if args.out:
            vertex_diff.write.mode("overwrite").parquet(args.out)
        summary = snapshot_diff_summary(edges, edges_new)
        n_touched = vertex_diff.count()
        print(json.dumps({
            "cmd": "diff", **summary, "vertices_touched": n_touched,
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "mis":
        from efficient_graph_algorithms_spark.operators.mis import (
            maximal_independent_set)

        out, info = maximal_independent_set(spark, edges, vertices=vertices,
                                            max_rounds=args.max_rounds)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        agg = out.groupBy("cls").count().collect()
        sizes = {r["cls"]: r["count"] for r in agg}
        print(json.dumps({
            "cmd": "mis", "rounds": info["rounds"],
            "converged": info["converged"],
            "mis_size": sizes.get("mis", 0), "removed": sizes.get("out", 0),
            "live": sizes.get("live", 0),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "sssp":
        from efficient_graph_algorithms_spark.operators.sssp import shortest_paths

        if args.weights == "unit":
            wedges = edges.select("src", "dst", F.lit(1.0).alias("w"))
        else:
            wedges = edges.select(
                "src", "dst",
                (1 + (F.col("src") + F.col("dst")) % 5).cast("double").alias("w"))
        sources = vertices.where(F.col("id") % args.sources_mod == 0)
        dist, info = shortest_paths(spark, wedges, sources,
                                    max_iter=args.max_iter)
        if args.out:
            dist.write.mode("overwrite").parquet(args.out)
            dist = spark.read.parquet(args.out)
        agg = dist.agg(F.count("*").alias("n"), F.avg("dist").alias("avg"),
                       F.max("dist").alias("mx")).first()
        print(json.dumps({
            "cmd": "sssp", "weights": args.weights,
            "sources": sources.count(), "rounds": info["rounds"],
            "converged": info["converged"], "reached": int(agg["n"] or 0),
            "avg_dist": round(float(agg["avg"] or 0), 4),
            "max_dist": float(agg["mx"] or 0),
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "frontier":
        from efficient_graph_algorithms_spark.operators.frontier import (
            frontier_shards, shard_balance)

        url_dict = spark.read.parquet(f"{args.graph}/url_dict")
        shards = frontier_shards(url_dict, args.shards)
        if args.out:
            shards.write.mode("overwrite").parquet(args.out)
            shards = spark.read.parquet(args.out)
        bal = shard_balance(shards).collect()
        loads = sorted(r["n_pages"] for r in bal)
        print(json.dumps({
            "cmd": "frontier", "shards": args.shards,
            "hosts": shards.count(),
            "pages": sum(loads),
            "max_shard_pages": loads[-1] if loads else 0,
            "min_shard_pages": loads[0] if loads else 0,
            "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "modularity":
        from efficient_graph_algorithms_spark.operators.contract import host_of
        from efficient_graph_algorithms_spark.operators.modularity import (
            community_contributions, partition_modularity)

        if args.labels:
            labels = spark.read.parquet(args.labels)
            col = args.label_col
            if col is None:
                col = next(c for c in ("label", "component", "community", "cls")
                           if c in labels.columns)
            assignment = labels.select("id", F.col(col).alias("community"))
        else:
            url_dict = spark.read.parquet(f"{args.graph}/url_dict")
            assignment = url_dict.select(
                "id", host_of(F.col("url")).alias("community"))
        summary, info = partition_modularity(edges, assignment)
        if args.out:
            contrib = community_contributions(edges, assignment)
            contrib.write.mode("overwrite").parquet(args.out)
            top = (spark.read.parquet(args.out)
                   .orderBy(F.desc("contribution"), F.asc("community"))
                   .limit(args.top).collect())
        else:
            top = (community_contributions(edges, assignment)
                   .orderBy(F.desc("contribution"), F.asc("community"))
                   .limit(args.top).collect())
        print(json.dumps({
            "cmd": "modularity",
            "modularity": round(info["modularity"], 9),
            "m": info["m"], "internal_edges": info["internal_edges"],
            "n_communities": info["n_communities"],
            "sec": round(time.time() - t0, 2),
            "top": [{"community": r["community"],
                     "contribution": r["contribution"],
                     "internal": r["internal_edges"]} for r in top],
        }))
        return 0

    if args.cmd == "cocite":
        from efficient_graph_algorithms_spark.operators.cocite import (
            cocitation_topk)

        out, info = cocitation_topk(edges, k=args.k, min_count=args.min_count,
                                    degree_cap=args.cap, mode=args.mode)
        # write first and re-read (the sibling handlers' convention) so the
        # capped wedge join runs once, not once per action
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            out = spark.read.parquet(args.out)
        rows = sorted(
            ((r["a"], r["b"], r["n_common"]) for r in out.collect()),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        print(json.dumps({"cmd": "cocite", **info, "n_pairs": len(rows),
                          "top": rows[:5],
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "closeness":
        from efficient_graph_algorithms_spark.operators.anf import (
            truncated_closeness)

        srcs = vertices.where(F.col("id") % args.sample_mod == 0)
        res, info = truncated_closeness(spark, edges,
                                        max_radius=args.max_radius,
                                        sources=srcs)
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
        top = [
            {"id": r["id"], "closeness": r["closeness"],
             "n_reached": r["n_reached"]}
            for r in res.orderBy(F.desc("closeness"), "id").limit(args.top).collect()
        ]
        print(json.dumps({"cmd": "closeness", "radius": args.max_radius,
                          "sources": srcs.count(), "rounds": info["rounds"],
                          "top": top, "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "betweenness":
        from efficient_graph_algorithms_spark.operators.betweenness import (
            betweenness)

        srcs = vertices.where(F.col("id") % args.sample_mod == 0)
        res, info = betweenness(spark, edges, sources=srcs,
                                max_radius=args.max_radius)
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
        top = [
            {"id": r["id"], "bc": r["bc"]}
            for r in res.orderBy(F.desc("bc"), "id").limit(args.top).collect()
        ]
        print(json.dumps({"cmd": "betweenness", "radius": args.max_radius,
                          "sources": srcs.count(), "rounds": info["rounds"],
                          "scored": res.count(), "top": top,
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "bowtie":
        from efficient_graph_algorithms_spark.operators.scc import bowtie_classes

        labels, info = bowtie_classes(spark, edges)
        if args.out:
            labels.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"cmd": "bowtie", "core_scc": info["core_scc"],
                          "class_counts": info["class_counts"],
                          "outer_rounds": info["outer_rounds"],
                          "sec": round(time.time() - t0, 2)}))
        return 0

    if args.cmd == "walks":
        from efficient_graph_algorithms_spark.operators.walks import (
            node2vec_walks, random_walks)

        if args.biased:
            corpus, info = node2vec_walks(
                spark, edges, walk_length=args.length,
                w_return=args.w_return, w_in=args.w_in, w_out=args.w_out,
                walks_per_vertex=args.per_vertex, seed=args.seed,
                as_paths=args.paths,
            )
        else:
            corpus, info = random_walks(
                spark, edges, walk_length=args.length,
                walks_per_vertex=args.per_vertex, seed=args.seed,
                as_paths=args.paths,
            )
        if args.out:
            corpus.write.mode("overwrite").parquet(args.out)
        print(json.dumps({
            "cmd": "walks", "n_walks": info["n_walks"],
            "steps_run": info["steps_run"], "rows": corpus.count(),
            "live_final": info["live_walks"][-1] if info["live_walks"] else info["n_walks"],
            "sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.cmd == "scc":
        from efficient_graph_algorithms_spark.operators.scc import (
            strongly_connected_components,
        )

        labels, info = strongly_connected_components(spark, edges)
        if args.out:
            labels.write.mode("overwrite").parquet(args.out)
        sizes = labels.groupBy("scc").count()
        stats = sizes.agg(
            F.count(F.lit(1)).alias("n_sccs"), F.max("count").alias("giant")
        ).first()
        print(json.dumps({
            "cmd": "scc", "n": labels.count(), "n_sccs": stats["n_sccs"],
            "giant_scc": stats["giant"], "outer_rounds": info["outer_rounds"],
            "hops": info["hops"], "trim_assigned": info["trim_assigned"],
            "converged": info["converged"], "sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.cmd == "ktruss":
        from efficient_graph_algorithms_spark.operators.ktruss import k_truss

        truss, info = k_truss(spark, edges, args.k, max_iter=args.max_iter)
        if args.out:
            truss.write.mode("overwrite").parquet(args.out)
        print(json.dumps({
            "cmd": "ktruss", "k": args.k, "rounds": info["rounds"],
            "converged": info["converged"], "truss_edges": info["truss_edges"],
            "sec": round(time.time() - t0, 2),
        }))
        return 0

    if args.cmd == "anf":
        from efficient_graph_algorithms_spark.operators.anf import neighborhood_function

        res, info = neighborhood_function(
            spark, edges, max_radius=args.max_radius, mode=args.mode,
            registers=args.registers,
        )
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
        out = {
            "cmd": "anf", "mode": args.mode, "rounds": info["rounds"],
            "converged": info["converged"],
            "nf_totals": [round(t, 1) for t in info["totals"]],
            "sec": round(time.time() - t0, 2),
        }
        if "effective_diameter_90" in info:
            out["effective_diameter_90"] = info["effective_diameter_90"]
        if args.mode == "sketch" and args.top:
            top = res.orderBy(F.desc("harmonic_est")).limit(args.top).collect()
            out["top_harmonic"] = [
                {"id": r["id"], "harmonic": round(r["harmonic_est"], 2)} for r in top
            ]
        print(json.dumps(out))
        return 0

    if args.cmd == "hostgraph":
        from efficient_graph_algorithms_spark.operators.contract import host_graph

        url_dict = spark.read.parquet(f"{args.graph}/url_dict")
        hg = host_graph(edges, url_dict, keep_self_loops=args.keep_self_loops)
        if args.out:
            hg.write.mode("overwrite").parquet(args.out)
            hg = spark.read.parquet(args.out)
        top = (hg.orderBy(F.desc("weight"), F.asc("src_key"), F.asc("dst_key"))
               .limit(args.top).collect())
        print(json.dumps({
            "cmd": "hostgraph", "host_edges": hg.count(),
            "sec": round(time.time() - t0, 2),
            "top": [{"src": r["src_key"], "dst": r["dst_key"],
                     "weight": r["weight"]} for r in top],
        }))
        return 0

    if args.cmd == "triangles":
        from efficient_graph_algorithms_spark.operators.triangles import (
            triangle_count, triangles_per_vertex)

        total = triangle_count(edges).first()["triangles"]
        if args.out:
            triangles_per_vertex(edges, vertices=vertices).write.mode("overwrite").parquet(args.out)
        print(json.dumps({"cmd": "triangles", "triangles": int(total),
                          "sec": round(time.time() - t0, 2)}))
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
