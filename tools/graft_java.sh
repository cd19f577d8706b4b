#!/usr/bin/env bash
# Run a graft main class directly on the compiled classes + /opt/spark/jars,
# bypassing sbt startup (~30 s/invocation) for measurement loops.
# Usage: tools/graft_java.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 48g), SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR
# pass through exactly as under sbt (build.sbt's forked-run JVM options
# are replicated here verbatim).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-48g}" \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CP" "$@"
