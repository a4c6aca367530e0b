#!/bin/bash
# Dev helper: run a graft main directly against the compiled classes,
# bypassing sbt (no lock contention with a concurrent compile loop).
# Usage: ./run-main.sh <MainClass> [args...]   (env: SPARK_DRIVER_MEM)
set -euo pipefail
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"${SPARK_DRIVER_MEM:-24g}" $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
