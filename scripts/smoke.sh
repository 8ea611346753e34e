#!/usr/bin/env bash
# HTTP smoke test against a running server (the reference's hurl-script
# analog). Usage: scripts/smoke.sh [base_url] [master_key]
set -euo pipefail
BASE="${1:-http://localhost:8080}"
MASTER="${2:-change-me}"

say() { printf '%-40s' "$1"; }
ok() { echo "OK"; }

say "health"
curl -fsS "$BASE/health" > /dev/null && ok

say "create collection"
OUT=$(curl -fsS -X POST "$BASE/v1/collections/create" \
  -H "Authorization: Bearer $MASTER" -d '{"id":"smoke"}')
WK=$(echo "$OUT" | python3 -c 'import sys,json;print(json.load(sys.stdin)["write_api_key"])')
RK=$(echo "$OUT" | python3 -c 'import sys,json;print(json.load(sys.stdin)["read_api_key"])')
ok

say "create index + insert"
curl -fsS -X POST "$BASE/v1/collections/smoke/indexes/create" \
  -H "Authorization: Bearer $WK" -d '{"id":"main"}' > /dev/null
curl -fsS -X POST "$BASE/v1/collections/smoke/indexes/main/insert" \
  -H "Authorization: Bearer $WK" \
  -d '[{"id":"1","name":"smoke test product","price":42}]' > /dev/null && ok

say "search converges"
for i in $(seq 1 100); do
  COUNT=$(curl -fsS -X POST "$BASE/v1/collections/smoke/search?api-key=$RK" \
    -d '{"term":"smoke"}' | python3 -c 'import sys,json;print(json.load(sys.stdin)["count"])')
  [ "$COUNT" = "1" ] && break
  sleep 0.1
done
[ "$COUNT" = "1" ] && ok

say "filtered search"
HITS=$(curl -fsS -X POST "$BASE/v1/collections/smoke/search?api-key=$RK" \
  -d '{"term":"smoke","where":{"price":{"gt":40}}}' \
  | python3 -c 'import sys,json;print(json.load(sys.stdin)["count"])')
[ "$HITS" = "1" ] && ok

say "batch search"
curl -fsS -X POST "$BASE/v1/collections/smoke/search/batch?api-key=$RK" \
  -d '{"searches":[{"term":"smoke"},{"term":"zzz"}]}' > /dev/null && ok

say "stats + metrics"
curl -fsS "$BASE/v1/collections/smoke/stats?api-key=$RK" > /dev/null
curl -fsS "$BASE/metrics" | grep -q http_requests_total && ok

say "cleanup"
curl -fsS -X POST "$BASE/v1/collections/smoke/delete" \
  -H "Authorization: Bearer $MASTER" -d '{}' > /dev/null && ok

echo "SMOKE PASS"
