#!/bin/bash
set -x
QS="q_sim_rplsh_recall,q_curate_leakage,q_sim_graph_append,q_sim_graph_delete"
CORPUS=/root/repo/testdata-sf1.0-vocabgrow
OUT=/root/repo/tools/drift_r15
# checksum the corpus used (attribution prerequisite)
( cd $CORPUS && find . -name "*.parquet" | sort | xargs md5sum | md5sum ) > $OUT/corpus.md5 2>&1

cd /root/repo/.wt-probe-r14
sbt -batch "runMain graft.DriftProbe $CORPUS 4 $QS" > $OUT/probe_r14.log 2>&1
sbt -batch "runMain graft.PlanDump $CORPUS $QS" > $OUT/plan_r14.log 2>&1

cd /root/repo/.wt-probe-r13
sbt -batch "runMain graft.DriftProbe $CORPUS 4 $QS" > $OUT/probe_r13.log 2>&1
sbt -batch "runMain graft.PlanDump $CORPUS $QS" > $OUT/plan_r13.log 2>&1
echo DONE > $OUT/status
