#!/bin/sh
# Own mapper obeying the reference exe contract: stdin lines -> stdout
# "key\tvalue" lines. Tokenize on space/tab (brackets literal, per tr
# semantics), lowercase, emit <word>\t1 including empty tokens.
tr '[ \t]' '\n' | tr '[:upper:]' '[:lower:]' | awk '{print $1"\t1"}'
