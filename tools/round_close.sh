#!/bin/bash
# Round-close ritual (round-10 verdict item 7): run the driver-protocol
# bench at sf0.1 (min-of-2), then diff per-query against the TRACKED
# previous round's bench_detail.json and append the markdown table to
# PLANS.md — so regression adjudication starts from the artifact.
# Dev tooling only — not part of the engine.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/bench_close.json}
sbt -batch compile 1>&2
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_DETAIL="$OUT" \
  java $ADD_OPENS -Xmx48g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench 1>&2
python3 tools/bench_diff.py bench_detail.json "$OUT" 2.0 --md PLANS.md
