#!/bin/bash
# Launch a graft main against a FROZEN copy of the compiled classes, so
# long benchmark runs are immune to concurrent `sbt compile` rewriting
# target/scala-2.13/classes underneath a lazily-classloading JVM.
#
# usage: tools/run_frozen.sh [--refresh] <mainClass> [args...]
#   env: SPARK_DRIVER_MEM (default 8g) and every SPARK_GRAFT_* knob the
#   main itself reads pass straight through.
set -euo pipefail
FROZEN=/tmp/graft_frozen_classes
if [[ "${1:-}" == "--refresh" ]]; then shift; rm -rf "$FROZEN"; fi
if [[ ! -d "$FROZEN" ]]; then
  mkdir -p "$FROZEN"
  cp -r /root/repo/target/scala-2.13/classes/. "$FROZEN"/
fi
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$FROZEN:/opt/spark/jars/*" \
  "$MAIN" "$@"
