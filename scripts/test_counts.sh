#!/bin/sh
# Derive the ScalaTest totals from the build's own XML reports, so the
# SURVEY close-out counts are transcribed from the artifact instead of
# by hand — the 211/212, 291/292, 297/298 drift class came from manual
# transcription racing the last landed spec. Run after `sbt test`.
# Reports persist across builds for DELETED suites (a stale ParseProbe
# report inflated round 12's first count by one), so only reports whose
# suite class still exists in the test SOURCES count. Matching is by
# `class <X>` declaration grep, NOT by a same-named file — a suite
# defined in a differently-named file (or several suites in one file)
# must not be misclassified as stale, which would silently reintroduce
# the undercount drift this script exists to eliminate. If a skipped
# report's class name appears ANYWHERE under src/test, fail loudly
# instead of undercounting.
cd "$(dirname "$0")/.." || exit 1
python3 - <<'EOF2'
import glob
import os
import re
import subprocess
import sys
import xml.etree.ElementTree as ET

# every ScalaTest suite class declared anywhere under src/test
declared = set()
for root, _, files in os.walk("src/test"):
    for fn in files:
        if not fn.endswith(".scala"):
            continue
        with open(os.path.join(root, fn)) as fh:
            src = fh.read()
        declared.update(re.findall(r"\bclass\s+(\w+)", src))

tests = failures = errors = suites = 0
for f in sorted(glob.glob("target/test-reports/TEST-graft.*.xml")):
    cls = os.path.basename(f)[len("TEST-graft."):-len(".xml")]
    # nested-package reports (TEST-graft.sub.Cls.xml) keep the last part
    cls_simple = cls.rsplit(".", 1)[-1]
    if cls_simple not in declared:
        # loud cross-check: grep the raw sources for the name — if it
        # appears at all, the declaration regex missed it; fail rather
        # than silently undercount
        hit = subprocess.run(
            ["grep", "-rqw", cls_simple, "src/test"]).returncode == 0
        if hit:
            print(f"ERROR: report {cls} skipped as stale but '{cls_simple}' "
                  f"appears under src/test — matching logic is wrong")
            sys.exit(1)
        print(f"  (skipping stale report for deleted suite {cls})")
        continue
    r = ET.parse(f).getroot()
    tests += int(r.get("tests", 0))
    failures += int(r.get("failures", 0))
    errors += int(r.get("errors", 0))
    suites += 1
print(f"{tests} tests / {failures} failures / {errors} errors "
      f"across {suites} suite reports")
EOF2
