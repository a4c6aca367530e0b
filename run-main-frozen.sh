#!/bin/bash
# run-main.sh variant off a frozen classes snapshot (/tmp/graft_classes_frozen)
# so long measurements survive concurrent sbt compiles (zinc rewrites
# target/scala-2.13/classes and a running JVM dies on lazy classloading).
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
  -cp "/tmp/graft_classes_frozen:/opt/spark/jars/*" \
  "$MAIN" "$@"
