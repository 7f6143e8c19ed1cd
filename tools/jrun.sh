#!/bin/bash
# Run a graft tool main directly against compiled classes + Spark jars
# (avoids the sbt project lock so probes can run beside sbt test).
CLS=/root/repo/target/scala-2.13/classes
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $AO -Xmx${JRUN_MEM:-32g} -XX:ReservedCodeCacheSize=512m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" "$@"
