#!/usr/bin/env bash
# Fresh-checkout verification gate (VERDICT r5 item 9).
#
# Round 4's failure mode was "works in my tree, broken in the repo": the
# builder verified against untracked working-tree files that were never
# committed. This script makes that divergence impossible to miss: it
# exports HEAD (committed state ONLY — no untracked files, no working-tree
# edits) into a temp dir, rebuilds the native shims, and runs the test
# tiers there.
#
# Usage: scripts/check_fresh.sh [fast|slow|all]   (default: fast)
set -euo pipefail

TIER="${1:-fast}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
FRESH="$(mktemp -d /tmp/audiotabs_fresh.XXXXXX)"
trap 'rm -rf "$FRESH"' EXIT

echo "== exporting HEAD ($(git -C "$REPO" rev-parse --short HEAD)) to $FRESH"
git -C "$REPO" archive HEAD | tar -x -C "$FRESH"

echo "== building native shims"
(cd "$FRESH" && bash native/build.sh >/dev/null 2>&1) || \
  echo "   (native build failed — tests exercise the pure-Python fallbacks)"

cd "$FRESH"
rc=0
if [[ "$TIER" == "fast" || "$TIER" == "all" ]]; then
  echo "== fast tier"
  python -m pytest tests/ -q -m "not slow" || rc=$?
fi
if [[ "$TIER" == "slow" || "$TIER" == "all" ]]; then
  echo "== slow tier"
  python -m pytest tests/ -q -m slow || rc=$?
fi
exit $rc
