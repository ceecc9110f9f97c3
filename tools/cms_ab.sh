#!/bin/bash
# q_stream_cms adjudication (round-14 verdict item 2): round-8
# protocol A/B of the r13 tree (2857757) vs the r14 tree (7c86626)
# in git worktrees, fresh forked JVMs, median-of-5 stream_only,
# sf0.1 local[32], heap provider pinned explicitly, with two
# discriminating legs — SPARK_GRAFT_STATE_ADVISOR=0 (exonerate the
# round-14 default-on listener; the r13 tree has no advisor) and
# tmpfs scratch (the documented checkpoint-fsync isolation dial).
# q_stream_sketch rides along as the stable control, q_stream_dedup
# as the machine-band witness.
set -u
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=1g"
QUERIES=q_stream_cms,q_stream_sketch,q_stream_dedup

leg() {
  tree=$1; label=$2; shift 2
  echo "=== leg $label ($(date +%H:%M:%S)) ==="
  env "$@" SPARK_GRAFT_STATE_PROVIDER=heap \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_PASSES=5 SPARK_GRAFT_BENCH_ONLY=$QUERIES \
    java -cp "$tree/target/scala-2.13/classes:/opt/spark/jars/*" \
    $JOPTS graft.Bench 2>/dev/null | grep '"metric"' | sed "s/^/[$label] /"
}

leg /tmp/ab_r13 r13
leg /tmp/ab_r14 r14
leg /tmp/ab_r14 r14-advisor0 SPARK_GRAFT_STATE_ADVISOR=0
mkdir -p /dev/shm/graft_ab
leg /tmp/ab_r14 r14-tmpfs _JAVA_OPTIONS=-Djava.io.tmpdir=/dev/shm/graft_ab
leg /tmp/ab_r13 r13-tmpfs _JAVA_OPTIONS=-Djava.io.tmpdir=/dev/shm/graft_ab
rm -rf /dev/shm/graft_ab
echo "=== A/B complete ==="
