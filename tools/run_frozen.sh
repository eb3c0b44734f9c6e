#!/bin/bash
# Launch a graft main against a FROZEN copy of the compiled classes, so
# long benchmark runs are immune to concurrent `sbt compile` rewriting
# target/scala-2.13/classes underneath a lazily-classloading JVM.
#
# usage: tools/run_frozen.sh [--refresh] <mainClass> [args...]
#   env: SPARK_DRIVER_MEM (default 8g) and every SPARK_GRAFT_* knob the
#   main itself reads pass straight through.
set -euo pipefail
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
FROZEN=/tmp/graft_frozen_classes
if [[ "${1:-}" == "--refresh" ]]; then shift; rm -rf "$FROZEN"; fi
if [[ ! -d "$FROZEN" ]]; then
  # refuse to freeze while sbt/zinc is mid-compile (torn class directory)
  if pgrep -f 'sbt-launch|xsbt.boot.Boot' >/dev/null 2>&1; then
    echo "run_frozen.sh: sbt appears to be running — refusing to freeze a" >&2
    echo "possibly-torn $CLASSES; wait for the compile or pass a pre-frozen dir." >&2
    exit 1
  fi
  # copy to a temp dir, then atomically rename into place so a concurrent
  # launcher never classloads from a half-populated freeze
  TMP="$(mktemp -d /tmp/graft_frozen_classes.XXXXXX)"
  cp -r "$CLASSES"/. "$TMP"/
  mv -T "$TMP" "$FROZEN" 2>/dev/null || { rm -rf "$TMP"; [[ -d "$FROZEN" ]]; }
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
