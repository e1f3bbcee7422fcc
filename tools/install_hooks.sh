#!/usr/bin/env bash
# Install the pre-commit guard: every commit that touches Scala sources or
# the build runs `tools/gate.sh --quick` with the query list inferred from
# the staged diff, so the committed ROUND{N}_GATES.jsonl lines are emitted
# by the hook itself, not by per-wave discipline (the round-9 verdict's
# item 4 — the round-7 failure class was a commit that didn't compile).
#
# Escape hatch: `git commit --no-verify` skips the hook (use for doc-only
# emergencies; the full gate at round close will still catch drift).
#
# Query inference: `q_foo` tokens appearing on ADDED lines of the staged
# diff, intersected with nothing (unknown names are harmless — Verify's
# SPARK_GRAFT_ONLY filter ignores names it doesn't know, and compare.py
# reports them as absent only if Verify also skipped them). Doc/tool-only
# commits (no staged .scala / build.sbt) skip the gate entirely.
set -euo pipefail
cd "$(dirname "$0")/.."

HOOK=.git/hooks/pre-commit
cat > "$HOOK" <<'EOF'
#!/usr/bin/env bash
# Installed by tools/install_hooks.sh — do not edit in place.
# Bypass: git commit --no-verify
set -uo pipefail
cd "$(git rev-parse --show-toplevel)"

STAGED=$(git diff --cached --name-only --diff-filter=ACMR)
CODE=$(echo "$STAGED" | grep -E '\.scala$|^build\.sbt$' || true)
if [ -z "$CODE" ]; then
  exit 0  # doc/tool-only commit: nothing to compile or verify
fi

# q_* names on added lines of the staged diff -> targeted verify list.
# Known limitation: the gate compiles and verifies the WORKING TREE
# while the query list comes from the staged diff, so a partially
# staged commit is checked against code that is not being committed.
# The repo's workflow never partial-stages .scala files (gate.sh quick
# runs pre-stage, and the round log records HEAD+dirty); an exact gate
# would need a `git stash -k` / temp-index checkout, which risks
# clobbering in-flight work for a case that does not occur here.
QUERIES=$(git diff --cached -U0 -- $CODE \
  | grep -E '^\+' | grep -oE '"q_[a-z0-9_]+"' \
  | tr -d '"' | sort -u | paste -sd, -)

echo "[pre-commit] tools/gate.sh --quick ${QUERIES:-<compile only>}" >&2
tools/gate.sh --quick "$QUERIES"
EOF
chmod +x "$HOOK"
echo "installed $HOOK (bypass with --no-verify)"
