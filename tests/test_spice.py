"""SPICE subprocess gating (pycocoevalcap/spice/spice.py protocol).

No real SPICE jar exists in this image (the reference strips it too), so the
subprocess path is exercised with a fake ``java`` executable that speaks the
jar's file protocol: read the input JSON, write per-image
``{image_id, scores: {All: {f: ...}}}`` records to ``-out``.
"""

import json
import os
import stat
import warnings

import numpy as np

FAKE_JAVA = """#!/usr/bin/env python3
import json, sys
# argv: -Xmx8G -jar <jar> <in> -cache <dir> -out <out> -subset -silent
args = sys.argv[1:]
in_path = args[args.index("-jar") + 2]
out_path = args[args.index("-out") + 1]
data = json.load(open(in_path))
results = []
for item in data:
    # toy scoring: f = 1.0 if the hypothesis equals any reference else 0.25
    f = 1.0 if item["test"] in item["refs"] else 0.25
    results.append({"image_id": item["image_id"],
                    "scores": {"All": {"f": f, "p": f, "r": f},
                               "Object": {"f": None}}})
json.dump(results, open(out_path, "w"))
"""


def _install_fake_java(tmp_path, monkeypatch):
    java = tmp_path / "java"
    java.write_text(FAKE_JAVA)
    java.chmod(java.stat().st_mode | stat.S_IEXEC)
    jar = tmp_path / "spice-1.0.jar"
    jar.write_bytes(b"fake jar")
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    monkeypatch.setenv("SPICE_JAR", str(jar))


def test_spice_subprocess_protocol(tmp_path, monkeypatch):
    _install_fake_java(tmp_path, monkeypatch)
    from lrp_imagecaptioning_tpu.metrics.spice import (
        spice_available,
        spice_score,
    )

    assert spice_available()
    hyps = ["a dog runs", "a cat sits"]
    refs = [["a dog runs", "dog running"], ["two cats"]]
    avg, per_image = spice_score(hyps, refs)
    np.testing.assert_allclose(avg, (1.0 + 0.25) / 2)
    assert per_image[0]["All"]["f"] == 1.0
    assert np.isnan(per_image[0]["Object"]["f"])  # None -> NaN conversion


def test_spice_score_adapter_uses_jar(tmp_path, monkeypatch):
    _install_fake_java(tmp_path, monkeypatch)
    from lrp_imagecaptioning_tpu.metrics import SPICE

    out = SPICE().calculate(
        {0: [{"caption": "a dog runs"}], 1: [{"caption": "a cat sits"}]},
        {0: [{"caption": "a dog runs"}], 1: [{"caption": "two cats"}]},
    )
    np.testing.assert_allclose(out["spice"], (1.0 + 0.25) / 2)


def test_spice_degrades_without_jar(monkeypatch):
    monkeypatch.delenv("SPICE_JAR", raising=False)
    import lrp_imagecaptioning_tpu.metrics.spice as spice_mod

    monkeypatch.setattr(spice_mod, "find_spice_jar", lambda: None)
    from lrp_imagecaptioning_tpu.metrics import SPICE

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = SPICE().calculate(
            {0: [{"caption": "a dog"}]}, {0: [{"caption": "a dog"}]})
    assert out["spice"] == 0.0
    assert any("SPICE" in str(x.message) for x in w)
