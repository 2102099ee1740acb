#!/usr/bin/env python3
"""Generate SURVEY.md §2.4's per-family tables from the source of truth:
each operator file's `queries`/`oracles` maps plus the scaladoc above each
query def. Emits markdown to stdout.

Usage: python3 tools/gen_survey_map.py > /tmp/sec24.md
"""
import re
import sys
from pathlib import Path

ROOT = Path("/root/repo/src/main/scala/graft")
FILES = {
    "Relational (scan/join/agg/window/set ops)": ROOT / "operators/Relational.scala",
    "Events (time series, sessions, funnels, causal)": ROOT / "operators/Events.scala",
    "Text (quality, langid, tokens, BM25, fingerprints)": ROOT / "operators/Text.scala",
    "Similarity (cosine, ANN, PQ, rerankers)": ROOT / "operators/Similarity.scala",
    "NorthStar (dedup, decontamination, packing, mixing)": ROOT / "operators/NorthStar.scala",
    "Extras (json/maps/nulls/HOFs, infra audits)": ROOT / "operators/Extras.scala",
    "Graph (PageRank, triangles, communities, recsys)": ROOT / "operators/Graph.scala",
    "Stats (tests, drift, calibration, privacy)": ROOT / "operators/Stats.scala",
    "Layout (compaction, partitioning, file ops)": ROOT / "operators/Layout.scala",
    "Evaluation (metrics, eval harnesses)": ROOT / "operators/Evaluation.scala",
    "Streaming (batch-twin streams, stateful ops)": ROOT / "streaming/Windows.scala",
}


def parse_file(path):
    text = path.read_text()
    lines = text.splitlines()
    rel = str(path.relative_to("/root/repo"))

    # name -> method from the queries map
    qmap = {}
    in_q = False
    depth = 0
    for ln in lines:
        if re.search(r"val queries: Map\[String, Q\] = Map\(", ln):
            in_q = True
            depth = ln.count("(") - ln.count(")")
            continue
        if in_q:
            m = re.search(r'"([a-z0-9_]+)"\s*->\s*([A-Za-z0-9.]+)', ln)
            if m:
                qmap[m.group(1)] = m.group(2).split(".")[-1]
            depth += ln.count("(") - ln.count(")")
            if depth <= 0:
                in_q = False
    # oracle keys
    okeys = set()
    in_o = False
    for ln in lines:
        if re.search(r"val oracles: Map\[String, String\] = Map\(", ln):
            in_o = True
            continue
        if in_o:
            m = re.search(r'"(q[a-z0-9_]+)"\s*->', ln)
            if m:
                okeys.add(m.group(1))
            if ln.strip() == ")":
                in_o = False
    # def line numbers + scaladoc first sentence
    defs = {}
    for i, ln in enumerate(lines):
        m = re.search(r"def ([A-Za-z0-9]+)\s*[:(]", ln)
        if m:
            name = m.group(1)
            # walk back to scaladoc start
            desc = ""
            j = i - 1
            doc = []
            while j >= 0 and (lines[j].strip().startswith("*") or
                              lines[j].strip().startswith("/**") or
                              lines[j].strip() == ""):
                doc.append(lines[j])
                if lines[j].strip().startswith("/**"):
                    break
                j -= 1
            doc.reverse()
            if doc:
                joined = " ".join(d.strip().lstrip("/*").strip() for d in doc)
                # strip "QNN:" prefix, take up to first " — " or sentence end
                joined = re.sub(r"^Q\d+[a-z]?\s*(\([^)]*\))?:\s*", "", joined)
                cut = len(joined)
                for sep in [" — ", ". ", " - ", ": "]:
                    p = joined.find(sep)
                    if 20 < p < cut:
                        cut = p
                desc = joined[:cut]
                if len(desc) > 90:  # cut at a word boundary
                    desc = desc[:90].rsplit(" ", 1)[0] + "…"
            defs[name] = (i + 1, desc)
    return rel, qmap, okeys, defs


# engine-only queries: where their property/recall/equality pins live
# (mirrors QueriesGoldenSpec's documented set — drift fails that suite)
PINS = {
    "q35_approx_distinct": "NorthStarSpec (rel-error vs exact)",
    "q37_minhash_pairs": "NorthStarSpec (bound vs exact Jaccard)",
    "q39_simhash_pairs": "NorthStarSpec (hamming vs jaccard pins)",
    "q40_ann_lsh": "NorthStarSpec (recall floor)",
    "q41_ann_ivf": "NorthStarSpec (recall) + PlanAuditSpec",
    "q108_equidepth_scale": "ScaleTwinsSpec (quantile drift)",
    "q113_embed_dedup_blocked": "ScaleTwinsSpec (recall >= 0.98 vs q72)",
    "q114_cosine_topk_blocked": "ScaleTwinsSpec (recall vs q30 exact)",
    "q124_ann_ivf_batch": "NorthStarSpec (loop-equality vs q41)",
    "q153_ann_ivf_foldin": "NorthStarSpec (fold-in drift curve)",
    "q166_bpe_merges": "UtilitiesSpec (hand-computed merges)",
    "q172_pq_codebook": "PqSpec (determinism + distortion descent)",
    "q173_pq_adc_recall": "PqSpec (recall floor + determinism)",
    "q188_ivfpq": "PqSpec (containment + recall floor)",
    "q200_compaction": "LayoutSpec (rows/content preserved)",
    "q214_bpe_fertility": "UtilitiesSpec (encode replay)",
    "q294_minhash_quality_eval": "NorthStarSpec (recall floor + containment)",
    "q486_lof_blocked": "ScaleTwinsSpec (5-NN recall + drift + top-15 vs q478)",
    "q507_twonn_blocked": "ScaleTwinsSpec (2-NN recall + id_mle drift vs q414)",
    "q508_hubness_blocked": "ScaleTwinsSpec (in-degree fidelity + skew drift vs q431)",
    "q518_match_norm_dedup": "UtilitiesSpec (value battery + idempotency + count replay)",
}


def qsort_key(name):
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 999


def main():
    total = 0
    oracle_total = 0
    rows = []
    for family, path in FILES.items():
        rel, qmap, okeys, defs = parse_file(path)
        if not qmap:
            continue
        rows.append((family, rel, qmap, okeys, defs))
    print("| query | check | where | what |")
    print("|---|---|---|---|")
    for family, rel, qmap, okeys, defs in rows:
        for name in sorted(qmap, key=qsort_key):
            meth = qmap[name]
            line, desc = defs.get(meth, ("?", ""))
            check = "oracle" if name in okeys else \
                "engine-only: " + PINS.get(name, "?")
            if name in okeys:
                oracle_total += 1
            total += 1
            print(f"| {name} | {check} | {rel.split('/')[-1]}:{line} | {desc} |")
    print(f"\n<!-- generated: {total} queries, {oracle_total} oracle-checked, "
          f"{total - oracle_total} engine-only -->", file=sys.stderr)
    print(f"{total} queries, {oracle_total} oracle", file=sys.stderr)


if __name__ == "__main__":
    main()
