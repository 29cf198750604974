#!/bin/bash
# Binary→text config conversion: the workflow equivalent of the reference's
# readBin.sh (/root/reference/readBin.sh), which sed-edits lattice dims into
# readBinConf.cpp, recompiles it, and pipes two filenames on stdin. Here the
# converter sniffs the lattice shape from the file's own index records, so
# one tool handles every size with no rebuild; the stdin form is kept
# pipe-compatible.
#
# Run from anywhere:  bash examples/readBin.sh [CONF.ctxt [OUT.txt]]
set -euo pipefail
cd "$(dirname "$0")/.."

CONF_PATH=${1:-2D_U1_Ns64_Nt64_b40000_m02000_0.ctxt}
NAME=${2:-human_readable_conf.txt}

printf "${CONF_PATH}\n${NAME}\n" | python -m schwingermodel_tpu.tools.readbinconf
echo "wrote ${NAME}"
