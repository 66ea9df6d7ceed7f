"""Check README/STATUS headline numbers against committed bench artifacts.

VERDICT r4 #3: three rounds in a row, a performance table quoted a
builder-session number that did not match the driver-captured artifact.
This check makes that structurally impossible: every headline number in
README.md / STATUS.md is wrapped in an invisible marker naming the artifact
and JSON field it came from,

    <!--bench:BENCH_r04.json:value-->109.1<!--/bench-->

and this tool verifies each quoted number is a correct rounding of the
named artifact's actual field.  It fails on:

  * a quoted value that does not match the artifact (drift),
  * a marker citing a missing artifact or field,
  * a bench config (headline/enhance/landmarks/parse/scale) with no
    citation at all in README.md (coverage),
  * README.md or STATUS.md containing no markers (the markers were
    stripped).

It *warns* (does not fail) when a newer round's artifact exists for a
cited config, because the driver writes BENCH_r{N}.json after the round's
last commit — citing the newest *committed* artifact is the requirement.

Run directly (``python tools/check_bench_numbers.py``) or via the quick
test tier (``tests/test_bench_numbers.py``).
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MARKER = re.compile(
    r"<!--bench:(?P<artifact>[A-Za-z0-9_.]+):(?P<path>[A-Za-z0-9_.]+)-->"
    r"(?P<quoted>[-0-9.,]+)<!--/bench-->"
)

# Bench config suffixes that must each be cited at least once in README.md.
CONFIGS = ("", "_enhance", "_landmarks", "_parse", "_scale", "_serving")

# The headline detect config appears under two artifact names: the driver's
# end-of-round BENCH_r{N}.json and the in-round refresh BENCH_r{N}_detect.json
# (named so a refresh never clobbers the driver artifact).  Both count as the
# headline ("") config.
_CONFIG_ALIASES = {"_detect": ""}


def load_field(artifact: str, path: str):
    """Resolve a dotted field path inside a bench artifact's JSON.

    Artifacts written by the driver wrap the parsed line in a "parsed" key;
    paths resolve against "parsed" when present, falling back to the root.
    """
    fp = os.path.join(REPO, artifact)
    if not os.path.exists(fp):
        raise FileNotFoundError(artifact)
    with open(fp) as f:
        doc = json.load(f)
    for root in (doc.get("parsed"), doc):
        if root is None:
            continue
        node = root
        ok = True
        for part in path.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            elif isinstance(node, list) and part.isdigit():
                node = node[int(part)]
            else:
                ok = False
                break
        if ok:
            return node
    raise KeyError(f"{artifact}: no field {path!r}")


def quoted_matches(quoted: str, actual: float) -> bool:
    """True when `quoted` is a correct rounding/truncation of `actual`."""
    text = quoted.replace(",", "")
    try:
        qv = float(text)
    except ValueError:
        return False
    decimals = len(text.split(".")[1]) if "." in text else 0
    tol = 0.5 * 10.0 ** (-decimals) + 1e-9
    if abs(qv - float(actual)) <= tol:
        return True
    # Accept truncation too (e.g. 739.61 quoted as 739.6 or 739).
    factor = 10.0**decimals
    return math.floor(float(actual) * factor) / factor == qv


def newest_round(config: str) -> int:
    """Highest round N for which BENCH_r{N}{config}.json exists."""
    suffixes = [config] + [a for a, c in _CONFIG_ALIASES.items() if c == config]
    best = -1
    for suffix in suffixes:
        for fp in glob.glob(os.path.join(REPO, f"BENCH_r*{suffix}.json")):
            m = re.match(
                rf"BENCH_r(\d+){re.escape(suffix)}\.json$", os.path.basename(fp)
            )
            if m:
                best = max(best, int(m.group(1)))
    return best


def check(files=("README.md", "STATUS.md")) -> list[str]:
    errors: list[str] = []
    warnings: list[str] = []
    cited: dict[str, set[int]] = {c: set() for c in CONFIGS}

    for name in files:
        fp = os.path.join(REPO, name)
        with open(fp) as f:
            text = f.read()
        markers = list(MARKER.finditer(text))
        if not markers:
            errors.append(f"{name}: no <!--bench:...--> markers found")
            continue
        for m in markers:
            artifact, path, quoted = m.group("artifact", "path", "quoted")
            try:
                actual = load_field(artifact, path)
            except (FileNotFoundError, KeyError) as e:
                errors.append(f"{name}: marker cites missing {e}")
                continue
            if not isinstance(actual, (int, float)):
                errors.append(f"{name}: {artifact}:{path} is not numeric")
                continue
            if not quoted_matches(quoted, actual):
                errors.append(
                    f"{name}: quotes {quoted} for {artifact}:{path}, "
                    f"artifact says {actual}"
                )
            rm = re.match(r"BENCH_r(\d+)(_[a-z]+)?\.json$", artifact)
            if rm and name == "README.md":
                cfg = rm.group(2) or ""
                cfg = _CONFIG_ALIASES.get(cfg, cfg)
                if cfg in cited:
                    cited[cfg].add(int(rm.group(1)))

    for cfg in CONFIGS:
        have = newest_round(cfg)
        if have < 0:
            continue  # config never benched — nothing to cite
        if not cited[cfg]:
            errors.append(
                f"README.md: no citation of any BENCH_r*{cfg or ''}.json artifact"
            )
        elif max(cited[cfg]) < have:
            warnings.append(
                f"README.md cites round {max(cited[cfg])} for config "
                f"'{cfg or 'headline'}' but BENCH_r{have:02d}{cfg}.json exists "
                f"(driver wrote it after the last doc update?)"
            )

    for w in warnings:
        print(f"WARNING: {w}")
    return errors


def main() -> int:
    errors = check()
    if errors:
        for e in errors:
            print(f"ERROR: {e}")
        return 1
    print("bench-number hygiene: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
