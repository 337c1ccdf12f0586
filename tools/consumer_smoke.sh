#!/bin/bash
# External-consumer smoke: package the library, then build and run the
# MINIMAL dependent project under tools/consumer-smoke/ from a clean
# target — the facade driven as a black box through the published jar,
# the way an adopter would consume it (README "Quickstart as a
# library"). Green = the script prints "consumer smoke green" and
# exits 0.
#
# SKIP_PACKAGE=1 reuses an already-built jar (e.g. when an interactive
# sbt session owns the repo's build server).
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
if [ "${SKIP_PACKAGE:-0}" != 1 ]; then
  sbt -batch package
fi
JAR=$(ls -t "$ROOT"/target/scala-2.13/interpro7dwspark_2.13-*.jar | head -1)
[ -f "$JAR" ] || { echo "no packaged jar — run sbt package" >&2; exit 1; }

cd "$ROOT/tools/consumer-smoke"
rm -rf target lib
mkdir -p lib
cp "$JAR" lib/graft.jar
sbt -batch run | tee /tmp/consumer_smoke.out
grep -q "CONSUMER-SMOKE OK" /tmp/consumer_smoke.out
echo "consumer smoke green"
