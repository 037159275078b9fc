"""Guard the committed ablation evidence (VERDICT r3 #3 / weak #1).

Round 3's partial --arms reruns clobbered docs/ablation_r3_production.json
down to one arm while PARITY.md kept citing the 7-arm table — the committed
evidence no longer backed the published numbers. The harness now merges
partial runs (run_ablation.py), the artifact is restored from git, and this
test pins every docs ablation JSON that a PARITY/README table cites to the
arm set the table shows, so a future clobber fails CI instead of shipping.
"""
import json
import os

import pytest

DOCS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs")

ALL7 = {"s1", "nog", "rand", "prior", "priorN", "priorL", "priorNL"}

# file → the arms its published table (PARITY.md / README.md) cites.
MANIFEST = {
    # dense-variant production table (PARITY.md "production.json")
    "ablation_r3_production.json": ALL7,
    # headline sparse-COLMAP table (PARITY.md + README.md)
    "ablation_r3_production_colmap.json": ALL7,
    # seed-1 repeat
    "ablation_r3_production_seed1.json": ALL7,
    # 512² guidance-resolution scale check (3 arms as published; extended
    # coverage lands in ablation_r4_* files)
    "ablation_r3_production_latent512.json": {"rand", "prior", "priorN"},
    # corruption variants
    "ablation_r3_tint.json": {"s1", "nog", "rand", "prior", "priorN"},
    "ablation_r3_struct_cleandepth.json":
        {"s1", "nog", "rand", "prior", "priorN"},
    # round-4 shipped-combine table (PARITY.md "Round 4: shipped-combine
    # arms"): TRUE shipped 2-way SDS + reference per-modality CSD triples
    "ablation_r4_shipped_combine.json":
        {"s1", "nog", "prior-sds", "priorNL-sds", "priorNL-csdref"},
    # round-4 lindisp=True headline variant (the shipped sampling mode,
    # aconfig_1.txt:45 — VERDICT r3 #5)
    "ablation_r4_lindisp.json": {"s1", "nog", "prior", "priorNL"},
    # round-5 literal-shipped-configuration table (PARITY.md "Round 5"):
    # lindisp=True AND 2-way SDS together, with rand + csd_ref controls
    # (VERDICT r4 missing #1 / weak #3)
    "ablation_r5_shipped_full.json":
        {"s1", "nog", "rand-sds", "prior-sds", "priorNL-sds",
         "prior-csdref", "priorNL-csdref"},
    # round-5 512² extension (PARITY.md "Round-5 extension"): headline
    # LoRA arms + the combine axis at the reference's shipped resolution,
    # including the no-LoRA prior-sds isolation arm (VERDICT r4 missing #2)
    "ablation_r5_latent512.json":
        {"s1", "prior-sds", "priorL", "priorNL-sds", "priorNL-csdref"},
    # round-5 hard-scene-family run (PARITY.md "Round 5: the harder scene
    # family"): the controlled negative result — every stage-2 arm below
    # s1 on the textured world (VERDICT r4 #6)
    "ablation_r5_hardscene.json": {"s1", "nog", "prior", "priorNL"},
}


@pytest.mark.parametrize("fname,arms", sorted(MANIFEST.items()))
def test_ablation_artifact_has_cited_arms(fname, arms):
    path = os.path.join(DOCS, fname)
    assert os.path.exists(path), f"cited artifact missing: docs/{fname}"
    data = json.load(open(path))
    missing = arms - set(data)
    assert not missing, (
        f"docs/{fname} lost arms its published table cites: "
        f"{sorted(missing)} (a partial --arms rerun clobbered it?)")
    empty = [a for a in arms
             if "eval_psnr_masked" not in data[a] or "iter" not in data[a]]
    assert not empty, f"docs/{fname}: arms with empty/degenerate rows: {empty}"
