"""METEOR via the Meteor 1.5 jar, subprocess-gated (mirrors :mod:`.spice`).

The reference's intended METEOR capability is the jar
(``models/metrics.py:3,59,71-73`` imports a vendored ``Meteor`` wrapper whose
directory is absent from the repo; users vendor it, ``Readme.md:46-48``).
This module speaks the standard coco-caption ``-stdio`` protocol:

- the jar is spawned once per scoring call as
  ``java -jar -Xmx2G <jar> - - -stdio -l en -norm``;
- one ``SCORE ||| <ref1> ||| <ref2> ... ||| <hyp>`` line per image, each
  answered by one stats line;
- one ``EVAL ||| <stats> ||| <stats> ...`` line, answered by one score line
  per image followed by the final aggregate score.

The jar is located from ``$METEOR_JAR`` or a ``meteor-*.jar`` next to this
file; it is NOT shipped.  Callers degrade to the native
:func:`.meteor.meteor_score` when unavailable.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess


def find_meteor_jar() -> str | None:
    env = os.environ.get("METEOR_JAR")
    if env and os.path.isfile(env):
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    hits = sorted(glob.glob(os.path.join(here, "meteor-*.jar")))
    return hits[0] if hits else None


def meteor_available() -> bool:
    return shutil.which("java") is not None and find_meteor_jar() is not None


def _clean(s: str) -> str:
    return s.replace("|||", "").replace("\n", " ").replace("\r", " ").strip()


def meteor_jar_score(
    hyps: list[str], refs: list[list[str]], *, jar: str | None = None
) -> tuple[float, list[float]]:
    """Score paired (hypothesis, references) lists with the jar.
    Returns (aggregate score, per-image scores)."""
    jar = jar or find_meteor_jar()
    if jar is None:
        raise FileNotFoundError("no meteor jar ($METEOR_JAR or meteor-*.jar)")
    proc = subprocess.Popen(
        ["java", "-jar", "-Xmx2G", jar, "-", "-", "-stdio", "-l", "en",
         "-norm"],
        cwd=os.path.dirname(os.path.abspath(jar)) or None,
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
    )
    try:
        eval_parts = ["EVAL"]
        for h, rl in zip(hyps, refs):
            score_line = " ||| ".join(
                ("SCORE", " ||| ".join(_clean(r) for r in rl), _clean(h)))
            proc.stdin.write((score_line + "\n").encode())
            proc.stdin.flush()
            eval_parts.append(proc.stdout.readline().decode().strip())
        proc.stdin.write((" ||| ".join(eval_parts) + "\n").encode())
        proc.stdin.flush()
        per_image = [float(proc.stdout.readline().decode().strip())
                     for _ in hyps]
        overall = float(proc.stdout.readline().decode().strip())
    finally:
        proc.stdin.close()
        proc.wait()
    return overall, per_image
