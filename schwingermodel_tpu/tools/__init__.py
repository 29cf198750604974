"""Standalone command-line tools (reference: readBinConf.cpp, readBin.sh)."""
