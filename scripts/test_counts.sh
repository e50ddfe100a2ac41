#!/bin/sh
# Derive the ScalaTest totals from the build's own XML reports, so the
# SURVEY close-out counts are transcribed from the artifact instead of
# by hand — the 211/212, 291/292, 297/298 drift class came from manual
# transcription racing the last landed spec. Run after `sbt test`.
# Reports persist across builds for DELETED suites (a stale ParseProbe
# report inflated round 12's first count by one), so only reports whose
# suite still has a source file count.
cd "$(dirname "$0")/.." || exit 1
python3 - <<'EOF2'
import glob
import os
import xml.etree.ElementTree as ET

tests = failures = errors = suites = 0
for f in sorted(glob.glob("target/test-reports/TEST-graft.*.xml")):
    cls = os.path.basename(f)[len("TEST-graft."):-len(".xml")]
    if not os.path.exists(f"src/test/scala/graft/{cls}.scala"):
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
