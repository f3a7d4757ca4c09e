#!/usr/bin/env bash
# Run a graft main class directly against compiled classes + /opt/spark/jars
# (bypasses sbt forking; much faster for repeated runs).
# Usage: tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
#        SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.Bench
set -euo pipefail
MAIN="$1"; shift || true
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
