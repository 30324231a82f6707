#!/bin/bash
# Mode sweep for the dedup pipeline at one parallelism level (default 4x4
# executor JVMs), 2M docs: baseline persist vs AQE-broadcast-64m vs
# parquet-checkpoint stages vs both. Direct-java (no sbt lock), mirrors
# build.sbt's JVM flags. Usage: profile_modes.sh [level] [docs] [rounds] [modes...]
set -u
LEVEL="${1:-4x4}"; DOCS="${2:-2000000}"; ROUNDS="${3:-3}"; shift 3 || true
MODES=("${@:-persist}")
if [ ${#MODES[@]} -eq 0 ]; then MODES=(persist bc64 ckpt ckpt,bc64); fi

OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
  sun.security.action sun.util.calendar; do \
  printf -- "--add-opens=java.base/%s=ALL-UNNAMED " "$p"; done)

export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
export SPARK_LOCAL_DIRS=/dev/shm/graft-spark

for MODE in "${MODES[@]}"; do
  echo "=== level=$LEVEL docs=$DOCS rounds=$ROUNDS mode=$MODE ==="
  java -Xms16g -Xmx16g -XX:+AlwaysPreTouch $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dgraft.localDir=/dev/shm/graft-spark \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.ProfilePipeline "$LEVEL" "$DOCS" "$ROUNDS" "$MODE" 2>&1 \
    | grep -E "^\[profile\]|Exception|Error" | grep -v "ErrorHandler"
done
