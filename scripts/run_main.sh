#!/bin/bash
# Run a graft main class directly against the sbt-compiled classes +
# /opt/spark/jars — same JVM flags as build.sbt's forked run, minus the
# ~25 s sbt startup per invocation. For local iteration only; the driver
# contract stays `sbt "runMain graft.Bench"`.
#   scripts/run_main.sh graft.Bench
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run_main.sh graft.tools.JobProfile q181_mor_endurance 2
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
LANG=C.UTF-8 LC_ALL=C.UTF-8 exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dfile.encoding=UTF-8 \
  -Dsun.jnu.encoding=UTF-8 \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
