#!/bin/sh
# Build the 3-level-namespace alias catalog plugin (idps.jar).
# Requires JDK 17 and a pyspark installation (for the Spark jars).
set -e
cd "$(dirname "$0")"
JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
javac -encoding UTF-8 -cp "$JARS/*" idps/catalog/*.java
jar cf idps.jar idps/catalog/*.class
echo "built $(pwd)/idps.jar"
