#!/usr/bin/env bash
# Run a graft main directly with java (no sbt, no target-lock contention):
#   tools/run_main.sh graft.Bench
# Requires `sbt compile` to be up to date. Mirrors build.sbt's forked-JVM
# options (JDK17 add-opens + SPARK_DRIVER_MEM heap).
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
CP="$CLASSES:/opt/spark/jars/*"
OPENS="java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
ADD_OPENS=""
for p in $OPENS; do ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"; done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
