#!/bin/bash
# Compile individual graft source files against the existing target
# classes + Spark jars WITHOUT sbt (so probes compile while sbt test
# holds the build lock). Output goes to target/scala-2.13/classes.
set -e
exec java -cp "/opt/spark/jars/scala-compiler-2.13.17.jar:/opt/spark/jars/scala-library-2.13.17.jar:/opt/spark/jars/scala-reflect-2.13.17.jar" \
  scala.tools.nsc.Main \
  -classpath "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  -d /root/repo/target/scala-2.13/classes "$@"
