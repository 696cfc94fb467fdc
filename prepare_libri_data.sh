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
set -euo pipefail

BASE_URL="https://www.openslr.org/resources/12"
subsets=("$@")
[[ ${#subsets[@]} -eq 0 ]] && subsets=(100)

fetch() { # url dest_dir rename_to
  local url=$1 dest=$2 rename=$3 tarball
  tarball=$(basename "$url")
  mkdir -p "$dest"
  if [[ ! -d "$dest/$rename" ]]; then
    echo ">> downloading $tarball"
    wget -q --show-progress -P "$dest" "$url"
    tar -xzf "$dest/$tarball" -C "$dest"
    mv "$dest/LibriSpeech" "$dest/$rename"
    rm -f "$dest/$tarball"
  else
    echo ">> $dest/$rename exists, skipping"
  fi
}

for h in "${subsets[@]}"; do
  case $h in
    100) fetch "$BASE_URL/train-clean-100.tar.gz" "data/100" "LibriSpeech_train" ;;
    360) fetch "$BASE_URL/train-clean-360.tar.gz" "data/360" "LibriSpeech_train" ;;
    500) fetch "$BASE_URL/train-other-500.tar.gz" "data/500" "LibriSpeech_train" ;;
    *) echo "unknown subset: $h (use 100/360/500)"; exit 1 ;;
  esac
done

fetch "$BASE_URL/dev-clean.tar.gz" "data/eval" "LibriSpeech_dev"
fetch "$BASE_URL/test-clean.tar.gz" "data/eval" "LibriSpeech_test"
echo "done."
