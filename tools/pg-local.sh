#!/usr/bin/env bash
# Stand up a THROWAWAY local PostgreSQL cluster for the live-sink specs
# (PostgresLiveSpec-style runs) on machines with postgres binaries but no
# Docker — the complement of tools/postgis-compose.yml.
#
#   tools/pg-local.sh start   # initdb + start on port 54329, prints the URL
#   tools/pg-local.sh stop    # stop + delete the cluster
#
# postgres refuses to run as root: when invoked as root this script creates
# (or reuses) a 'pglocal' system user and runs the cluster as them.
# Requirements for the spec to actually run: the PostgreSQL JDBC driver
# (postgresql-<ver>.jar) on the sbt classpath — drop it into lib/ (sbt's
# unmanaged dir); this sandbox has no egress, so none ships here.
# PostGIS additionally needs the server-side extension packages
# (postgis control files under `pg_config --sharedir`/extension) — without
# them PostgisLiveSpec cancels and only the plain-Postgres coverage runs.
set -euo pipefail

PGDATA="${PGDATA_LOCAL:-/tmp/graft_pglocal}"
PORT="${PGPORT_LOCAL:-54329}"
PGUSER_LOCAL=pglocal

run_as_pg() {
  if [ "$(id -u)" = 0 ]; then
    id "$PGUSER_LOCAL" >/dev/null 2>&1 || useradd -m "$PGUSER_LOCAL"
    # cd first: su drops into a cwd the pg user may not be able to read
    su "$PGUSER_LOCAL" -c "cd / && $*"
  else
    bash -c "$*"
  fi
}

case "${1:-}" in
  start)
    mkdir -p "$PGDATA"
    [ "$(id -u)" = 0 ] && chown "$PGUSER_LOCAL" "$PGDATA"
    run_as_pg "initdb -D '$PGDATA' -A trust -U $PGUSER_LOCAL" >/dev/null
    run_as_pg "pg_ctl -D '$PGDATA' -l '$PGDATA/log' -o '-p $PORT -k $PGDATA' start"
    URL="jdbc:postgresql://127.0.0.1:$PORT/postgres?user=$PGUSER_LOCAL"
    echo "POSTGRES_URL=$URL"
    # PostGIS probe: when the server-side extension packages exist on this
    # box, emit POSTGIS_URL too — exporting it auto-enables the full
    # PostgisLiveSpec (typed geometry DDL + SRID round-trip); without the
    # packages only the plain-Postgres coverage runs and the spec cancels
    # with the precise missing piece.
    SHAREDIR="$(pg_config --sharedir 2>/dev/null || true)"
    if [ -n "$SHAREDIR" ] && [ -f "$SHAREDIR/extension/postgis.control" ]; then
      echo "POSTGIS_URL=$URL"
      echo "# postgis.control found under $SHAREDIR/extension — export" \
           "POSTGIS_URL above to run PostgisLiveSpec end-to-end"
    else
      echo "# no postgis.control under ${SHAREDIR:-<unknown sharedir>}/extension:" \
           "PostgisLiveSpec will cancel (plain-Postgres specs still run)"
    fi
    ;;
  stop)
    run_as_pg "pg_ctl -D '$PGDATA' stop" || true
    rm -rf "$PGDATA"
    ;;
  *)
    echo "usage: $0 start|stop" >&2
    exit 2
    ;;
esac
