#!/bin/bash
# Round-7 bench A/B experiment (VERDICT task 1):
#  (a) HEAD vs f14f1c1 back-to-back on an idle machine, HEAD sandwiched
#      (A, f14, B) to detect within-window drift;
#  (b) fresh-JVM split test: suite run as two halves in separate JVMs,
#      sum vs single-JVM total, to test the session-accumulation hypothesis.
set -u
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g"
CP_HEAD="/root/repo/.ab/head_classes:/opt/spark/jars/*"
CP_F14="/root/repo/.ab/f14/target/scala-2.13/classes:/opt/spark/jars/*"
META=/root/repo/.ab/meta.txt

bench() { # name classpath [only]
  local dir=/root/repo/.ab/run_$1
  mkdir -p "$dir"
  cd "$dir"
  echo "=== $1 start $(date +%T) $(uptime)" >> "$META"
  if [ -n "${3:-}" ]; then
    env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_ONLY="$3" java $JOPTS -cp "$2" graft.Bench \
        > stdout.json 2> stderr.log
  else
    env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        java $JOPTS -cp "$2" graft.Bench > stdout.json 2> stderr.log
  fi
  echo "=== $1 end   $(date +%T) $(uptime)" >> "$META"
}

: > "$META"
bench headA "$CP_HEAD"
bench f14   "$CP_F14"
bench headB "$CP_HEAD"
bench half1 "$CP_HEAD" "$(cat /root/repo/.ab/half1.txt)"
bench half2 "$CP_HEAD" "$(cat /root/repo/.ab/half2.txt)"
echo DONE >> "$META"
