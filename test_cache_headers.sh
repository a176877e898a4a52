#!/usr/bin/env bash
# E2E cache-header verification against a live imagekit_tpu server.
#
# Equivalent of the reference's test_cache_headers.sh: drives the
# sign -> img flow and asserts the full cache-header contract
# (Cache-Control directives, CDN-Cache-Control, Vary, ETag, Content-Type),
# then interprets cf-cache-status when running behind Cloudflare.
#
# Usage: ./test_cache_headers.sh [BASE_URL] [SOURCE_IMAGE_URL]
set -u

BASE="${1:-http://localhost:8080}"
SRC="${2:-https://picsum.photos/800/600}"

PASS=0
FAIL=0

green() { printf '\033[32m%s\033[0m\n' "$*"; }
red()   { printf '\033[31m%s\033[0m\n' "$*"; }

check() { # check <desc> <haystack> <needle>
  local desc="$1" hay="$2" needle="$3"
  if printf '%s' "$hay" | grep -qi -- "$needle"; then
    green "  ok: $desc"
    PASS=$((PASS+1))
  else
    red   "  FAIL: $desc (wanted '$needle')"
    FAIL=$((FAIL+1))
  fi
}

echo "== health =="
HEALTH=$(curl -fsS "$BASE/health") || { red "server unreachable at $BASE"; exit 1; }
check "health status" "$HEALTH" '"status": *"healthy"'

echo "== sign =="
SIGN=$(curl -fsS "$BASE/sign?url=$SRC&w=400&f=webp&q=80")
check "canonical present" "$SIGN" '"canonical"'
check "sig present" "$SIGN" '"sig"'
SIGNED_URL=$(printf '%s' "$SIGN" | python3 -c 'import json,sys; print(json.load(sys.stdin)["signed_url"])')
[ -n "$SIGNED_URL" ] || { red "no signed_url"; exit 1; }
echo "  signed_url: $SIGNED_URL"

echo "== first /img request (expect transform or cache) =="
H1=$(curl -fsS -D - -o /tmp/ik_e2e_img1 "$BASE$SIGNED_URL")
check "200 OK" "$H1" '^HTTP.* 200'
check "Cache-Control public" "$H1" 'cache-control: .*public'
check "browser max-age=31536000" "$H1" 'max-age=31536000'
check "edge s-maxage=86400" "$H1" 's-maxage=86400'
check "immutable" "$H1" 'immutable'
check "stale-if-error" "$H1" 'stale-if-error=86400'
check "stale-while-revalidate" "$H1" 'stale-while-revalidate=60'
check "CDN-Cache-Control" "$H1" 'cdn-cache-control: max-age=86400'
check "Vary: Accept-Encoding" "$H1" 'vary: accept-encoding'
check "ETag quoted" "$H1" 'etag: "'
check "Content-Type image/webp" "$H1" 'content-type: image/webp'

echo "== second request (origin cache hit, identical bytes) =="
H2=$(curl -fsS -D - -o /tmp/ik_e2e_img2 "$BASE$SIGNED_URL")
check "200 OK" "$H2" '^HTTP.* 200'
if cmp -s /tmp/ik_e2e_img1 /tmp/ik_e2e_img2; then
  green "  ok: hit bytes identical to miss"
  PASS=$((PASS+1))
else
  red "  FAIL: cached bytes differ"
  FAIL=$((FAIL+1))
fi
ETAG1=$(printf '%s' "$H1" | grep -i '^etag:' | tr -d '\r')
ETAG2=$(printf '%s' "$H2" | grep -i '^etag:' | tr -d '\r')
if [ -n "$ETAG1" ] && [ "$ETAG1" = "$ETAG2" ]; then
  green "  ok: ETag stable across requests"
  PASS=$((PASS+1))
else
  red "  FAIL: ETag changed ($ETAG1 vs $ETAG2)"
  FAIL=$((FAIL+1))
fi

echo "== conditional revalidation (304 on matching If-None-Match) =="
ETAG_VAL=$(printf '%s' "$ETAG2" | sed 's/^[Ee][Tt][Aa][Gg]: *//')
H304=$(curl -sS -D - -o /dev/null -H "If-None-Match: $ETAG_VAL" "$BASE$SIGNED_URL")
check "304 Not Modified" "$H304" '^HTTP.* 304'
check "304 carries ETag" "$H304" 'etag: "'
HMISS=$(curl -sS -D - -o /dev/null -H 'If-None-Match: "bogus"' "$BASE$SIGNED_URL")
check "mismatched validator still 200" "$HMISS" '^HTTP.* 200'

echo "== local hit-path proof (metrics counters) =="
# the reference script can only infer hits from latency; the rebuild's
# /metrics makes the origin hit observable directly
M=$(curl -fsS "$BASE/metrics")
HITS=$(printf '%s' "$M" | grep '^imagekit_cache_hits_total' | awk '{print $2}')
if [ -n "$HITS" ] && [ "${HITS%.*}" -ge 1 ]; then
  green "  ok: imagekit_cache_hits_total >= 1 after second request ($HITS)"
  PASS=$((PASS+1))
else
  red "  FAIL: no cache hit recorded in /metrics (hits=$HITS)"
  FAIL=$((FAIL+1))
fi

echo "== /sign also gets edge-cache headers (reproduced quirk SURVEY §2.4.3) =="
HS=$(curl -fsS -D - -o /dev/null "$BASE/sign?url=$SRC&w=401")
check "sign 200" "$HS" '^HTTP.* 200'
check "sign Cache-Control rewritten by middleware" "$HS" 's-maxage=86400'
check "sign CDN-Cache-Control" "$HS" 'cdn-cache-control: max-age=86400'

echo "== upload (no-store rewritten by middleware on 2xx — reproduced quirk) =="
python3 - <<'PYEOF'
from PIL import Image
import numpy as np
Image.fromarray(np.full((32, 32, 3), 99, np.uint8)).save("/tmp/ik_e2e_up.png")
PYEOF
HU=$(curl -fsS -D - -o /tmp/ik_e2e_up_out -F "file=@/tmp/ik_e2e_up.png" -F w=16 "$BASE/upload")
check "upload 200" "$HU" '^HTTP.* 200'
check "upload Content-Type image" "$HU" 'content-type: image/'
check "upload Cache-Control rewritten (middleware overrides no-store)" "$HU" 's-maxage=86400'

echo "== error-path statuses =="
HT=$(curl -sS -D - -o /dev/null "$BASE/img?url=$SRC&w=400&sig=deadbeef")
check "tampered sig -> 401" "$HT" '^HTTP.* 401'
HM=$(curl -sS -D - -o /dev/null "$BASE/img?url=$SRC&w=400")
check "missing sig -> 400" "$HM" '^HTTP.* 400'

echo "== cloudflare edge interpretation =="
CF=$(printf '%s' "$H2" | grep -i 'cf-cache-status' | tr -d '\r' || true)
if [ -n "$CF" ]; then
  case "$CF" in
    *HIT*)         green "  cf-cache-status HIT — served from Cloudflare edge";;
    *MISS*)        echo  "  cf-cache-status MISS — first request; edge will cache this response";;
    *EXPIRED*)     echo  "  cf-cache-status EXPIRED — edge copy expired, revalidating against origin";;
    *REVALIDATED*) echo  "  cf-cache-status REVALIDATED — stale copy revalidated";;
    *DYNAMIC*)     red   "  cf-cache-status DYNAMIC — edge is NOT caching (add a 'Cache Everything' page rule)";;
    *BYPASS*)      red   "  cf-cache-status BYPASS — cache bypassed (check page rules / cookies)";;
    *)             echo  "  $CF (unknown status)";;
  esac
  AGE=$(printf '%s' "$H2" | grep -i '^age:' | tr -d '\r' || true)
  [ -n "$AGE" ] && echo "  $AGE seconds since the edge cached this object"
else
  echo "  (no cf-cache-status header — not behind Cloudflare; expected for localhost)"
fi

echo
echo "=== $PASS passed, $FAIL failed ==="
[ "$FAIL" -eq 0 ]
