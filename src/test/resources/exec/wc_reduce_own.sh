#!/bin/sh
# Own reducer: sorted "key\t1" lines on stdin -> "key\tcount" on stdout.
cut -f1 | uniq -c | awk '{print $2"\t"$1}'
