# Shared fresh-JVM launch scaffold for the tools/ runners (r19
# self-review: the --add-opens list was copy-pasted into four scripts;
# a JDK/Spark bump that needs one more open must now land HERE once).
# Source it, then use $ADDOPENS (JPMS opens mirroring spark-submit's
# JavaModuleOptions — without them Kryo dies InaccessibleObjectException)
# and $GRAFT_CP / $GRAFT_TEST_CP (main / main+test classpaths).
GRAFT_CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
GRAFT_TEST_CP="/root/repo/target/scala-2.13/test-classes:$GRAFT_CP"
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADDOPENS="$ADDOPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
