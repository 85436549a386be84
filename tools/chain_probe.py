#!/usr/bin/env python
"""End-to-end CLI chain scaling probe (r10 verdict ask #1, second
half): per-STAGE wall clock of the composed pipelines — --corpusPrep,
--eventReport, --nightly — across a data decade, recorded as a
"chains" section in SCALING.json.

Individual registry queries have measured exponents (scaling_probe);
composed chains can still surprise: memo reuse across stages, persist
pressure, AQE decisions that flip at 10x, and the store-mediated
handoffs between phases. This probe runs the REAL CLI entry points
(cli.main, in-process so pass 2 is warm like a long-lived driver) and
parses the per-stage "[N.Ns]" log lines the CLI now emits.

- corpusPrep / eventReport: sf0.1 vs the sf1 replica
  (tools/scaling_probe.py's disjoint-entity replication, built on
  demand).
- nightly: the XML-fed chain has no sf-dir input, so its decade is a
  generated release: N and 10N VariationArchive records (replicated
  golden record, unique accessions/ids), same genes/aux shapes as the
  CLI tests. Phases: load, annotate (+ rs, vcf with --full-nightly).

alpha = log10(t_10x / t_1x) per stage, from pass-2 (warm) walls.
Stages above 1.2 land in chains_super_linear for adjudication.

Usage: python tools/chain_probe.py [--skip-nightly] [--records 2000]
       [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import math
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_RE = re.compile(r"^([\w./-]+): \d+ \[(\d+\.\d)s\]$")
PHASE_RE = re.compile(r"^nightly-phase (\w+): \[(\d+\.\d)s\]$")


def run_cli(argv: list[str]) -> dict[str, float]:
    """Run cli.main in-process, return {stage: seconds} parsed from
    the per-stage log lines."""
    from clinvar_pipeline_spark.caching import release_cached
    from clinvar_pipeline_spark.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    release_cached()
    out: dict[str, float] = {}
    for line in buf.getvalue().splitlines():
        m = STAGE_RE.match(line.strip()) or PHASE_RE.match(line.strip())
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def probe_chain(argv_for, passes: int = 2) -> list[dict[str, float]]:
    return [run_cli(argv_for(i)) for i in range(passes)]


def gen_release(spark, root: str, n_records: int) -> dict[str, str]:
    """A synthetic release of ``n_records`` unique VariationArchive
    records (the golden FULL_RECORD with substituted accessions/ids)
    plus the genes/aux tables the load+annotate chain needs — the
    nightly chain's scalable input."""
    from tests.test_vcv_xml import FULL_RECORD, HEADER, TRAILER

    os.makedirs(root, exist_ok=True)
    xml = os.path.join(root, "release.xml")
    with open(xml, "w", encoding="utf-8") as f:
        f.write(HEADER)
        for i in range(n_records):
            rec = (
                FULL_RECORD.replace("VCV000000011", f"VCV{i:09d}")
                .replace('VariationID="11"', f'VariationID="{i}"')
                .replace('AlleleID="26042"', f'AlleleID="{i}"')
                .replace("RCV000000012", f"RCV{2 * i:09d}")
                .replace("RCV000000013", f"RCV{2 * i + 1:09d}")
            )
            f.write(rec)
        f.write(TRAILER)

    spark.createDataFrame(
        [(101, "9907", "AP5Z1"), (102, "1111", "OTHER")],
        "gene_rgd_id long, gene_id string, symbol string",
    ).write.mode("overwrite").parquet(f"{root}/genes.parquet")
    aux = f"{root}/aux"
    spark.createDataFrame(
        [(101, 501, 3)],
        "gene_rgd_id long, homolog_rgd_id long, homolog_species_type_key int",
    ).write.mode("overwrite").parquet(f"{aux}/orthologs.parquet")
    spark.createDataFrame(
        [("RDO:0001", "RDO", "Hereditary spastic paraplegia 48", False)],
        "acc_id string, ontology_id string, term string, is_obsolete boolean",
    ).write.mode("overwrite").parquet(f"{aux}/ont_terms.parquet")
    spark.createDataFrame(
        [], "term_acc string, name string, type string"
    ).write.mode("overwrite").parquet(f"{aux}/ont_synonyms.parquet")
    spark.createDataFrame(
        [], "cui string, gene_rgd_id long, omim_id string"
    ).write.mode("overwrite").parquet(f"{aux}/concept_omim.parquet")
    spark.createDataFrame(
        [],
        "annotated_object_rgd_id long, term_acc string, aspect string,"
        " evidence string, with_info string, xref_source string, notes string",
    ).write.mode("overwrite").parquet(f"{aux}/existing_annotations.parquet")
    return {"xml": xml, "genes": f"{root}/genes.parquet", "aux": aux}


def alphas(lo: dict[str, float], hi: dict[str, float]) -> dict[str, float]:
    out = {}
    for k in lo:
        if k in hi:
            out[k] = round(
                math.log(max(hi[k], 1e-3) / max(lo[k], 1e-3)) / math.log(10), 3
            )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-nightly", action="store_true")
    ap.add_argument("--records", type=int, default=2000,
                    help="nightly low point; high point is 10x")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json"))
    args = ap.parse_args()

    from tools.scaling_probe import SF1_DIR, SF_MID, build_sf1

    from clinvar_pipeline_spark.session import get_spark

    spark = get_spark(app_name="chain-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{SF1_DIR}/_COMPLETE"):
        print("building sf1 replica ...", file=sys.stderr)
        shutil.rmtree(SF1_DIR, ignore_errors=True)
        build_sf1(spark)
        open(f"{SF1_DIR}/_COMPLETE", "w").close()

    work = "/tmp/spark_graft_chain_probe"
    shutil.rmtree(work, ignore_errors=True)
    chains: dict = {}

    for mode, flag in (("corpusPrep", "--corpusPrep"),
                       ("eventReport", "--eventReport")):
        per_sf = {}
        for sf_name, sf_dir in (("sf0.1", SF_MID), ("sf1", SF1_DIR)):
            runs = probe_chain(
                lambda i, m=mode, s=sf_name, d=sf_dir: [
                    flag, "--sf", d, "--out", f"{work}/{m}_{s}_p{i}"
                ]
            )
            per_sf[sf_name] = runs
            print(f"{mode} {sf_name}: {runs[-1]}", file=sys.stderr)
        a = alphas(per_sf["sf0.1"][-1], per_sf["sf1"][-1])
        total_lo = sum(per_sf["sf0.1"][-1].values())
        total_hi = sum(per_sf["sf1"][-1].values())
        chains[mode] = {
            "sf0.1": per_sf["sf0.1"],
            "sf1": per_sf["sf1"],
            "alpha_per_stage": a,
            "total_warm": {"sf0.1": round(total_lo, 1),
                           "sf1": round(total_hi, 1)},
            "alpha_total": round(
                math.log(max(total_hi, 1e-3) / max(total_lo, 1e-3))
                / math.log(10), 3),
        }

    if not args.skip_nightly:
        per_n = {}
        for label, n in (("1x", args.records), ("10x", args.records * 10)):
            root = f"{work}/nightly_{label}"
            inp = gen_release(spark, root, n)
            runs = probe_chain(
                lambda i, r=root, p=inp: [
                    "--nightly",
                    "--xml", p["xml"], "--genes", p["genes"],
                    "--aux", p["aux"], "--out", f"{r}/out_p{i}",
                ]
            )
            per_n[label] = runs
            print(f"nightly {label} ({n} records): {runs[-1]}",
                  file=sys.stderr)
        a = alphas(per_n["1x"][-1], per_n["10x"][-1])
        chains["nightly"] = {
            "records": [args.records, args.records * 10],
            "1x": per_n["1x"],
            "10x": per_n["10x"],
            "alpha_per_phase": a,
        }

    flagged = []
    for mode, rec in chains.items():
        for stage, a in (rec.get("alpha_per_stage")
                         or rec.get("alpha_per_phase", {})).items():
            if a > 1.2:
                flagged.append(f"{mode}/{stage}")

    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    doc["chains"] = chains
    doc["chains_super_linear"] = flagged
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"chains_super_linear": flagged,
                      "modes": list(chains)}))


if __name__ == "__main__":
    main()
