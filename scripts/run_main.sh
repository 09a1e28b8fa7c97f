#!/bin/bash
# Direct JVM runner for graft mains — bypasses the sbt lock so long
# verify/bench runs can overlap an sbt test session. Requires the
# classes to have been compiled by a prior `sbt compile`. Heap via
# GRAFT_XMX (default 8g; the bench/verify drivers export 96g). Usage:
#   scripts/run_main.sh graft.Verify /tmp/sf1 /tmp/out ...
cd "$(dirname "$0")/.."
exec java -Xmx"${GRAFT_XMX:-8g}" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
