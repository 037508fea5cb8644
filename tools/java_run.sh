#!/bin/bash
# Launch a graft main through plain java on the sbt-compiled classes —
# byte-identical runtime to `sbt -batch runMain` (same JDK17 --add-opens
# set and JVM sizing as build.sbt's javaOptions) without holding sbt's
# project lock, so long scale campaigns can run in the background while
# interactive compiles continue. Compile first: `sbt -batch compile`.
# Usage: tools/java_run.sh <mainClass> [args...]
set -eu
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  ${SPARK_GRAFT_JVM:-} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
