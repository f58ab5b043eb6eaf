#!/bin/bash
# Run an sbt-shell command in the tmux 'sbt' session and wait for the
# prompt to return, then print the result tail. Usage: sbtrun.sh "cmd"
set -u
tmux clear-history -t sbt
tmux send-keys -t sbt "$1" Enter
sleep 5
while true; do
  full=$(tmux capture-pane -t sbt -pS -)
  last=$(echo "$full" | grep -vE '^\s*$' | tail -1)
  if echo "$last" | grep -qE '^sbt:.*> *$'; then
    break
  fi
  sleep 10
done
tmux capture-pane -t sbt -pS - | \
  grep -E "Tests: succeeded|\*\*\* FAILED|\[success\]|\[error\]|queries dumped|\"metric\"" | tail -12
