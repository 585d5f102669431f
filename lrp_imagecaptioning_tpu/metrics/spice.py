"""SPICE via the Stanford scene-graph jar, subprocess-gated.

Mirrors the reference's vendored scorer (pycocoevalcap/spice/spice.py:11,
30-96): hypotheses/references are dumped to a JSON work file, the jar is
invoked as ``java -Xmx8G -jar spice-*.jar <in> -cache <dir> -out <out>
-subset -silent``, and the score is the mean of each image's
``scores['All']['f']`` (None -> NaN).  When java or the jar is missing the
caller degrades to 0.0 with a warning (the reference does the same for
METEOR, models/metrics.py:62-67).

The jar is located from ``$SPICE_JAR`` or a ``spice-*.jar`` next to this
file; it is NOT shipped (the reference repo strips it too,
.MISSING_LARGE_BLOBS:1).
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import subprocess
import tempfile


def find_spice_jar() -> str | None:
    env = os.environ.get("SPICE_JAR")
    if env and os.path.isfile(env):
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    hits = sorted(glob.glob(os.path.join(here, "spice-*.jar")))
    return hits[0] if hits else None


def spice_available() -> bool:
    return shutil.which("java") is not None and find_spice_jar() is not None


def _float(v) -> float:
    try:
        f = float(v)
    except (TypeError, ValueError):
        return math.nan
    return f


def spice_score(
    hyps: list[str], refs: list[list[str]], *, jar: str | None = None
) -> tuple[float, list[dict]]:
    """Run the SPICE jar on paired (hypothesis, references) lists.
    Returns (average All-F score, per-image category score dicts)."""
    jar = jar or find_spice_jar()
    if jar is None:
        raise FileNotFoundError("no spice jar ($SPICE_JAR or spice-*.jar)")
    input_data = [
        {"image_id": i, "test": h, "refs": list(r)}
        for i, (h, r) in enumerate(zip(hyps, refs))
    ]
    work = tempfile.mkdtemp(prefix="spice_")
    try:
        in_path = os.path.join(work, "input.json")
        out_path = os.path.join(work, "output.json")
        cache_dir = os.path.join(work, "cache")
        os.makedirs(cache_dir, exist_ok=True)
        with open(in_path, "w") as f:
            json.dump(input_data, f, indent=2)
        subprocess.check_call(
            ["java", "-Xmx8G", "-jar", jar, in_path,
             "-cache", cache_dir, "-out", out_path, "-subset", "-silent"],
            cwd=os.path.dirname(os.path.abspath(jar)) or None,
        )
        with open(out_path) as f:
            results = json.load(f)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    by_id = {item["image_id"]: item["scores"] for item in results}
    all_f = [_float(by_id[i]["All"]["f"]) for i in range(len(hyps))]
    import numpy as np

    average = float(np.mean(np.array(all_f)))
    per_image = [
        {cat: {k: _float(v) for k, v in tup.items()}
         for cat, tup in by_id[i].items()}
        for i in range(len(hyps))
    ]
    return average, per_image
