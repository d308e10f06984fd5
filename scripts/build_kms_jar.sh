#!/usr/bin/env bash
# Compile the JVM RestKmsClient against the parquet/hadoop jars bundled
# with the installed pyspark, producing build/pme-kms.jar. Idempotent:
# skips the build when the jar is newer than the source.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SRC="$REPO/java/pmespark/RestKmsClient.java"
OUT="$REPO/build"
JAR="$OUT/pme-kms.jar"

if [[ -f "$JAR" && "$JAR" -nt "$SRC" ]]; then
  echo "$JAR"
  exit 0
fi

SPARK_JARS="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
CP="$(ls "$SPARK_JARS"/parquet-hadoop-*.jar "$SPARK_JARS"/parquet-common-*.jar "$SPARK_JARS"/hadoop-client-api-*.jar | tr '\n' ':')"

mkdir -p "$OUT/classes"
javac -encoding UTF-8 -classpath "$CP" -d "$OUT/classes" "$SRC"
jar cf "$JAR" -C "$OUT/classes" pmespark
echo "$JAR"
