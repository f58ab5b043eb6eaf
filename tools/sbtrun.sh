#!/bin/bash
# Run an sbt-shell command in the tmux 'sbt' session and wait for the
# prompt to return, then print the result tail. Usage: sbtrun.sh "cmd"
# Exits non-zero when the sbt session is missing, the command never
# returns within ~45 min, or the run ended in [error] / test failures.
set -u
if ! tmux has-session -t sbt 2>/dev/null; then
  echo "sbtrun.sh: no tmux session named 'sbt'" >&2
  exit 2
fi
tmux clear-history -t sbt
tmux send-keys -t sbt "$1" Enter
sleep 5
waited=5
while true; do
  full=$(tmux capture-pane -t sbt -pS - 2>/dev/null) || {
    echo "sbtrun.sh: tmux session 'sbt' went away" >&2; exit 2; }
  last=$(echo "$full" | grep -vE '^\s*$' | tail -1)
  if echo "$last" | grep -qE '^sbt:.*> *$'; then
    break
  fi
  if [ "$waited" -ge 2700 ]; then
    echo "sbtrun.sh: timed out after ${waited}s waiting for the sbt prompt" >&2
    exit 3
  fi
  sleep 10
  waited=$((waited + 10))
done
out=$(tmux capture-pane -t sbt -pS -)
echo "$out" | grep -E \
  "Tests: succeeded|\*\*\* FAILED|\[success\]|\[error\]|queries dumped|\"metric\"" \
  | tail -12
# verdict: the LAST [success]/[error] marker decides the exit code.
# NO marker at all (sbt crashed, session restarted, or the output
# outgrew the tmux history so the markers scrolled away) is NOT a
# pass — exit with a distinct code so the verify loop can't read a
# silent false green.
verdict=$(echo "$out" | grep -oE '\[(success|error)\]' | tail -1)
[ "$verdict" = "[error]" ] && exit 1
if [ -z "$verdict" ]; then
  echo "sbtrun.sh: no [success]/[error] marker in captured output" >&2
  exit 4
fi
exit 0
