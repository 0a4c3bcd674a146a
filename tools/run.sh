#!/bin/bash
# Fast runner: java directly against compiled classes + /opt/spark/jars,
# skipping sbt JVM startup. Usage: tools/run.sh graft.Verify <args...>
# (run `sbt -batch compile` first after source changes)
cd /root/repo
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SCALA_LIB=$(ls $HOME/.sbt/boot/scala-2.13*/lib/scala-library.jar 2>/dev/null | head -1)
if [ -z "$SCALA_LIB" ]; then
  SCALA_LIB=$(find $HOME/.cache/coursier -name "scala-library-2.13*.jar" 2>/dev/null | head -1)
fi
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "target/scala-2.13/classes:$SCALA_LIB:/opt/spark/jars/*" "$@"
