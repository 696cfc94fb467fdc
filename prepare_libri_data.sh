#!/usr/bin/env bash
# Download and extract LibriSpeech (reference: prepare_libri_data.sh:1-38).
#
# Usage: bash prepare_libri_data.sh [100] [360] [500]
#   arguments pick which training subsets to fetch; dev-clean/test-clean are
#   always fetched.  Layout matches the reference so the default
#   --*_corpus_dir flags work:
#     data/<h>/LibriSpeech_train/train-clean-<h>/...
#     data/eval/LibriSpeech_dev/dev-clean/...
#     data/eval/LibriSpeech_test/test-clean/...
# Offline operation (exercised by tests/test_libri_prepare.py so the only
# untested link in the real-data chain is the download URL itself):
#   LIBRI_SOURCE=<dir>    take tarballs from a local directory instead of
#                         downloading (same names, e.g. train-clean-100.tar.gz)
#   LIBRI_DATA_ROOT=<dir> extract under <dir> instead of ./data
set -euo pipefail

BASE_URL="https://www.openslr.org/resources/12"
DATA_ROOT="${LIBRI_DATA_ROOT:-data}"
subsets=("$@")
[[ ${#subsets[@]} -eq 0 ]] && subsets=(100)

fetch() { # url dest_dir rename_to
  local url=$1 dest=$2 rename=$3 tarball
  tarball=$(basename "$url")
  mkdir -p "$dest"
  if [[ ! -d "$dest/$rename" ]]; then
    if [[ -n "${LIBRI_SOURCE:-}" ]]; then
      echo ">> copying $tarball from $LIBRI_SOURCE"
      cp "$LIBRI_SOURCE/$tarball" "$dest/"
    else
      echo ">> downloading $tarball"
      wget -q --show-progress -P "$dest" "$url"
    fi
    tar -xzf "$dest/$tarball" -C "$dest"
    mv "$dest/LibriSpeech" "$dest/$rename"
    rm -f "$dest/$tarball"
  else
    echo ">> $dest/$rename exists, skipping"
  fi
}

for h in "${subsets[@]}"; do
  case $h in
    100) fetch "$BASE_URL/train-clean-100.tar.gz" "$DATA_ROOT/100" "LibriSpeech_train" ;;
    360) fetch "$BASE_URL/train-clean-360.tar.gz" "$DATA_ROOT/360" "LibriSpeech_train" ;;
    500) fetch "$BASE_URL/train-other-500.tar.gz" "$DATA_ROOT/500" "LibriSpeech_train" ;;
    *) echo "unknown subset: $h (use 100/360/500)"; exit 1 ;;
  esac
done

fetch "$BASE_URL/dev-clean.tar.gz" "$DATA_ROOT/eval" "LibriSpeech_dev"
fetch "$BASE_URL/test-clean.tar.gz" "$DATA_ROOT/eval" "LibriSpeech_test"
echo "done."
