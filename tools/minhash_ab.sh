#!/bin/bash
# Round-16 adjudication of q_minhash_lsh's r14->r15 sf0.1 drift
# (2.00 -> 3.32 s, non-overlapping spreads): the standard worktree A/B
# the r15 verdict prescribed. Interleaved median-of-5 per leg on the
# SAME machine minutes apart, plus a tmpfs leg to isolate disk weather
# (the pin path writes localCheckpoint blocks to java.io.tmpdir).
#   OLD = the r14 tree (7c86626), compiled at $OLD_CLASSES
#   NEW = the r15-equivalent tree (minhash path byte-identical to r15),
#         compiled at $NEW_CLASSES
set -u
OLD_CLASSES=${OLD_CLASSES:-/tmp/ab_r16_old/target/scala-2.13/classes}
NEW_CLASSES=${NEW_CLASSES:-/tmp/r15eq_classes}
Q=${Q:-q_minhash_lsh}
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=1g"
leg() { # $1=tag $2=classes $3=extra java opts
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=$Q SPARK_GRAFT_BENCH_PASSES=5 \
    java -cp "$2:/opt/spark/jars/*" $JOPTS $3 graft.Bench 2>/dev/null \
    | grep '"metric"' | sed "s/^/[$1] /"
}
echo "=== interleaved disk legs $(date +%H:%M:%S) ==="
leg old-disk  "$OLD_CLASSES" ""
leg new-disk  "$NEW_CLASSES" ""
leg old-disk2 "$OLD_CLASSES" ""
leg new-disk2 "$NEW_CLASSES" ""
echo "=== tmpfs legs $(date +%H:%M:%S) ==="
mkdir -p /dev/shm/graft_ab_tmp
leg old-tmpfs "$OLD_CLASSES" "-Djava.io.tmpdir=/dev/shm/graft_ab_tmp"
leg new-tmpfs "$NEW_CLASSES" "-Djava.io.tmpdir=/dev/shm/graft_ab_tmp"
rm -rf /dev/shm/graft_ab_tmp
